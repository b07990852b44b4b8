"""operators/fence.py: the shuffle-free evaluate-once barrier."""

from __future__ import annotations

from pyspark.sql import functions as F

from c_tran_data_pipeline_spark.functions.json_utils import json_get
from c_tran_data_pipeline_spark.operators.fence import eval_once


def test_eval_once_preserves_schema_and_rows(spark):
    df = spark.range(10).select(
        F.col("id"),
        (F.col("id") * 2).cast("int").alias("x"),
        F.when(F.col("id") % 2 == 0, F.lit(None)).otherwise(F.lit("s")).alias("s"),
    )
    out = eval_once(df)
    assert [f.name for f in out.schema.fields] == df.columns
    assert [f.dataType for f in out.schema.fields] == [f.dataType for f in df.schema.fields]
    assert sorted(map(tuple, out.collect())) == sorted(map(tuple, df.collect()))


def test_eval_once_is_shuffle_free(spark):
    df = spark.range(100).repartition(7).select("id", (F.col("id") + 1).alias("y"))
    fenced = eval_once(df).filter(F.col("y") > 10)
    plan = fenced._jdf.queryExecution().executedPlan().toString()
    # one exchange from the explicit repartition, none added by the fence
    assert plan.count("Exchange") == 1
    assert fenced.rdd.getNumPartitions() == 7


def test_eval_once_blocks_predicate_reexpansion(spark):
    """The point of the fence: a filter over a derived expensive column
    must reference the fenced attribute, not inline copies of the
    defining expression (FilterExec has no subexpression elimination)."""
    src = spark.createDataFrame([('{"k": 5}',), ('{"k": 400}',), (None,)], ["props"])
    k = json_get("props", "$.k", "int")
    derived = src.select((k * 5).alias("d"))

    unfenced = derived.filter(F.col("d").isNull() | F.col("d").between(0, 359))
    fenced = eval_once(derived).filter(F.col("d").isNull() | F.col("d").between(0, 359))

    unfenced_plan = unfenced._jdf.queryExecution().executedPlan().toString()
    fenced_plan = fenced._jdf.queryExecution().executedPlan().toString()
    # pushdown inlines one parse per predicate reference (3 here)...
    assert unfenced_plan.count("parseJson") >= 3
    # ...the fence leaves exactly the single projection-side parse
    assert fenced_plan.count("parseJson") == 1
    # and values are identical
    assert sorted(r["d"] for r in fenced.collect() if r["d"] is not None) == [25]
    assert [tuple(r) for r in fenced.collect()] == [tuple(r) for r in unfenced.collect()]


def test_eval_once_streaming_compatible(spark, tmp_path):
    """Generate is a stateless narrow op — a fenced conform must run
    under a streaming source with a downstream filter."""
    import json

    from c_tran_data_pipeline_spark import schemas
    from c_tran_data_pipeline_spark.functions.transforms import conform_breadcrumbs
    from c_tran_data_pipeline_spark.functions.validation import validate

    indir = tmp_path / "in"
    indir.mkdir()
    row = {
        "EVENT_NO_TRIP": "7",
        "OPD_DATE": "18-OCT-20",
        "VEHICLE_ID": "4008",
        "ACT_TIME": "34200",
        "GPS_LATITUDE": "45.52",
        "GPS_LONGITUDE": "-122.67",
        "DIRECTION": "90",
        "VELOCITY": "10",
    }
    bad = dict(row, DIRECTION="999")
    (indir / "b.json").write_text("\n".join(json.dumps(r) for r in [row, bad]))
    raw = spark.readStream.schema(schemas.RAW_BREADCRUMB).json(str(indir))
    out = validate(eval_once(conform_breadcrumbs(raw)))
    q = (
        out.writeStream.format("memory")
        .queryName("fenced_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.sql("SELECT * FROM fenced_stream").collect()
    assert len(rows) == 1 and rows[0].direction == 90
