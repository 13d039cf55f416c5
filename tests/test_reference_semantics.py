"""Golden-output parity with the reference notebooks (SURVEY §5).

The reference's de-facto test suite is its printed cell outputs. These tests
replicate those semantics on equivalent inline fixtures (schemas from
FIXTURES.md; golden values cited per test). Data shape mirrors the
reference's `test1/test2/test3.csv` without copying files.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datalake_brief_spark.mlops import impute
from datalake_brief_spark.operators.nulls import drop_nulls, fill_nulls, impute_mean
from datalake_brief_spark.operators.relational import aggregate, filter_rows


@pytest.fixture(scope="module")
def people(spark):
    """Shape of test2.csv (9×4 with 5 nulls in 3 patterns, reference
    pyspark-2.ipynb cells 2-11): name, age, experience, salary."""
    rows = [
        ("A", 31, 10, 30000),
        ("B", 30, 8, 25000),
        ("C", 29, 4, 20000),
        ("D", 24, 3, 20000),
        ("E", 21, 1, 15000),
        ("F", 23, 2, 18000),
        ("G", None, None, 40000),
        (None, 34, 10, 38000),
        (None, 36, None, None),
    ]
    return spark.createDataFrame(rows, "name string, age int, experience int, salary int")


class TestNaDrop:
    def test_drop_any_keeps_only_complete_rows(self, people):
        # reference pyspark-2.ipynb:125,154 — how='any' drops all 3 rows
        # that contain any null
        assert drop_nulls(people, how="any").count() == 6

    def test_drop_all_keeps_rows_with_one_nonnull(self, people):
        # reference pyspark-2.ipynb:186 golden: all rows survive how='all'
        assert drop_nulls(people, how="all").count() == 9

    def test_thresh_2_drops_rows_with_fewer_than_2_nonnull(self, people):
        # reference pyspark-2.ipynb:216 golden: thresh=2 drops only the
        # row with a single non-null cell... here (None,36,None,None) has
        # exactly 1 non-null → dropped; ('G',None,None,40000) has 2 → kept
        out = drop_nulls(people, thresh=2)
        assert out.count() == 8
        assert out.filter(F.col("age") == 36).count() == 0  # the 1-non-null row

    def test_subset_drops_only_on_named_column(self, people):
        # reference pyspark-2.ipynb:245 — subset='Experience'
        out = drop_nulls(people, subset=["experience"])
        assert out.count() == 7

    def test_fill_is_type_matched(self, people):
        # reference pyspark-2.ipynb:258-277 golden: a string fill value
        # touches only string columns; numeric nulls remain
        out = fill_nulls(people, "Missing")
        assert out.filter(F.col("name") == "Missing").count() == 2  # both null names
        # int columns untouched by a string fill
        assert out.filter(F.col("salary").isNull()).count() == 1
        assert out.filter(F.col("age").isNull()).count() == 1


class TestImpute:
    def test_ml_imputer_mean_truncates_into_int_columns(self, people):
        # reference pyspark-2.ipynb:286-324 golden: mean imputation into
        # integer columns truncates (age→28, experience→5, salary→25750)
        out = impute(people, ["age", "experience", "salary"], strategy="mean")
        g = out.filter(F.col("name") == "G").first()
        assert g.age_imputed == 28
        assert g.experience_imputed == 5
        last = out.filter(F.col("age") == 36).first()
        assert last.salary_imputed == 25750

    def test_declarative_impute_matches_ml_imputer(self, people):
        ml = impute(people, ["age"], strategy="mean")
        plan = impute_mean(people, ["age"])
        ml_vals = sorted(r.age_imputed for r in ml.collect())
        plan_vals = sorted(r.age_imputed for r in plan.collect())
        assert ml_vals == plan_vals


class TestGroupByGoldens:
    @pytest.fixture(scope="class")
    def t3(self, spark):
        """Shape of test3.csv (10×3, reference pyspark-2.ipynb cells 12-20):
        name, department, salary with the golden per-name sums."""
        rows = [
            ("Krish", "Data Science", 10000),
            ("Krish", "IOT", 5000),
            ("Mahesh", "Big Data", 4000),
            ("Krish", "Big Data", 4000),
            ("Mahesh", "Cloud", 3000),
            ("Sudhanshu", "Data Science", 20000),
            ("Sudhanshu", "IOT", 10000),
            ("Sudhanshu", "Big Data", 5000),
            ("Sunny", "Data Science", 10000),
            ("Sunny", "Big Data", 2000),
        ]
        return spark.createDataFrame(rows, "name string, department string, salary int")

    def test_groupby_sum_golden(self, t3):
        # reference pyspark-2.ipynb:533-539: Sudhanshu 35000, Sunny 12000,
        # Krish 19000, Mahesh 7000
        got = {
            r["name"]: r["total"]
            for r in aggregate(t3, ["name"], [F.sum("salary").alias("total")]).collect()
        }
        assert got == {"Sudhanshu": 35000, "Sunny": 12000, "Krish": 19000, "Mahesh": 7000}

    def test_groupby_mean_golden(self, t3):
        # reference pyspark-2.ipynb:560-565 department means
        got = {
            r["department"]: r["avg"]
            for r in aggregate(t3, ["department"], [F.avg("salary").alias("avg")]).collect()
        }
        assert got["Data Science"] == pytest.approx(13333.333333)
        assert got["IOT"] == pytest.approx(7500.0)

    def test_groupby_count_golden(self, t3):
        # reference pyspark-2.ipynb:583-589
        got = {
            r["department"]: r["n"]
            for r in aggregate(t3, ["department"], [F.count(F.lit(1)).alias("n")]).collect()
        }
        assert got == {"Data Science": 3, "IOT": 2, "Big Data": 4, "Cloud": 1}

    def test_global_agg_golden(self, t3):
        # reference pyspark-2.ipynb:608-611: sum(salary) = 73000
        assert aggregate(t3, [], [F.sum("salary").alias("s")]).collect()[0].s == 73000


class TestFilters:
    @pytest.fixture(scope="class")
    def t1(self, spark):
        rows = [
            ("Krish", 31, 10, 30000),
            ("Sudhanshu", 30, 8, 25000),
            ("Sunny", 29, 4, 20000),
            ("Paul", 24, 3, 20000),
            ("Harsha", 21, 1, 15000),
            ("Shubham", 23, 2, 18000),
        ]
        return spark.createDataFrame(rows, "name string, age int, experience int, salary int")

    def test_sql_string_and_column_filters_agree(self, t1):
        # reference pyspark-2.ipynb:360 vs :411 — same predicate two ways
        a = filter_rows(t1, "salary <= 20000").collect()
        b = filter_rows(t1, F.col("salary") <= 20000).collect()
        assert sorted(a) == sorted(b)
        assert len(a) == 4

    def test_conjunction_and_negation(self, t1):
        # reference pyspark-2.ipynb:436 (&) and :459 (~)
        both = filter_rows(
            t1, (F.col("salary") <= 20000) & (F.col("salary") >= 15000)
        ).count()
        neg = filter_rows(t1, ~(F.col("salary") <= 20000)).count()
        assert both == 4
        assert neg == 2

    def test_case_insensitive_resolution(self, t1):
        # reference pyspark-1.ipynb:226: select('Name','Age') vs column 'age'
        out = t1.select("Name", "Age")
        assert [r for r in out.columns] == ["Name", "Age"]
        assert out.count() == 6

    def test_derived_column_with_spaces_in_name(self, t1):
        # reference pyspark-1.ipynb:305: 'Experience + 2 years'
        out = t1.withColumn("Experience + 2 years", t1["experience"] + 2)
        assert out.filter(F.col("`Experience + 2 years`") == 12).count() == 1


class TestDescribe:
    def test_summary_stats_match_describe(self, spark):
        from datalake_brief_spark.operators.relational import summary_stats

        df = spark.createDataFrame(
            [Row(x=float(v)) for v in [31, 30, 29, 24, 21, 23]]
        )
        got = summary_stats(df, "x").collect()[0]
        # describe() golden convention: sample stddev (reference
        # pyspark-1.ipynb:280-288 shows stddev_samp values)
        assert got.n == 6
        assert got.mean == pytest.approx(26.3333)
        assert got.stddev == pytest.approx(4.1793)  # matches golden 4.17931...
        assert (got.min, got.max) == (21.0, 31.0)
