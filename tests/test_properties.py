"""Property-based tests (hypothesis) for the algebraic operators whose
contract is an equivalence: salting never changes results, splits
partition, packing conserves tokens — checked on adversarial generated
inputs, not just fixtures. Example counts are kept small because every
example runs Spark jobs."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.operators.curation import hash_split
from c_tran_data_pipeline_spark.operators.skew import salted_agg_count, salted_join

_settings = settings(
    max_examples=8, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)

keys = st.integers(min_value=-5, max_value=5)


@given(rows=st.lists(st.tuples(keys, st.integers(0, 100)), min_size=0, max_size=40))
@_settings
def test_salted_agg_count_matches_groupby(spark, rows):
    if not rows:
        return
    df = spark.createDataFrame(rows, "k int, payload int")
    plain = {r["k"]: r["count"] for r in df.groupBy("k").count().collect()}
    salted = {r["k"]: r["count"] for r in salted_agg_count(df, keys=["k"], salt=4).collect()}
    assert plain == salted


@given(
    big=st.lists(st.tuples(keys, st.integers(0, 9)), min_size=0, max_size=25),
    small=st.lists(st.tuples(keys, st.text("ab", min_size=1, max_size=2)), min_size=0, max_size=6),
)
@_settings
def test_salted_join_matches_plain_join(spark, big, small):
    if not big or not small:
        return
    b = spark.createDataFrame(big, "k int, payload int")
    s = spark.createDataFrame(small, "k int, name string").dropDuplicates(["k"])
    plain = sorted(map(tuple, b.join(s, "k").collect()))
    salted = sorted(map(tuple, salted_join(b, s, keys=["k"], salt=4).collect()))
    assert plain == salted


@given(ids=st.lists(st.integers(0, 10_000), min_size=1, max_size=50, unique=True))
@_settings
def test_hash_split_partitions_every_key(spark, ids):
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    out = hash_split(df, "doc_id").collect()
    assert len(out) == len(ids)
    assert all(r["split"] in ("train", "val", "test") for r in out)
    # stability: membership depends only on the key, not the input set
    half = hash_split(df.filter(F.col("doc_id") % 2 == 0), "doc_id").collect()
    full_map = {r["doc_id"]: r["split"] for r in out}
    assert all(full_map[r["doc_id"]] == r["split"] for r in half)
