"""Semi-structured extraction over the events ``props`` JSON column
(operators/sessions.json_props_agg).

Pins the three semantics the driver row can't isolate: (1) malformed
JSON and missing keys land in the NULL bucket instead of failing the job
(PERMISSIVE from_json — the poisoned-row property a 100 TB crawl log
needs), (2) the explicit-schema ``from_json`` path agrees with the
path-expression ``get_json_object`` alternative, and (3) extraction is a
plain projection — no Python UDF, no extra shuffle beyond the final
aggregate.
"""

from pyspark.sql import functions as F

from cloudbrush_spark.operators.sessions import json_props_agg


def _events(spark, props_rows):
    rows = [(i, "click" if i % 2 == 0 else "view", p)
            for i, p in enumerate(props_rows)]
    return spark.createDataFrame(
        rows, "event_id long, event_type string, props string")


def test_extraction_buckets_and_aggregates(spark):
    ev = _events(spark, ['{"k": 69}', '{"k": 89}', '{"k": 29}', '{"k": 4}'])
    got = {(r.event_type, r.k_bucket): (r.cnt, r.sum_k, r.max_k)
           for r in json_props_agg(ev).collect()}
    # event 0/2 -> click k=69,29 (bucket 9); event 1/3 -> view k=89 (9), 4 (4)
    assert got == {
        ("click", 9): (2, 98, 69),
        ("view", 9): (1, 89, 89),
        ("view", 4): (1, 4, 4),
    }


def test_malformed_and_missing_key_rows_survive_as_null_bucket(spark):
    ev = _events(spark, [
        '{"k": 7}',
        "not json at all",          # malformed -> NULL
        '{"other": 3}',             # key absent -> NULL
        '{"k": null}',              # explicit null -> NULL
        "",                         # empty string -> NULL
    ])
    out = json_props_agg(ev).collect()
    null_rows = [r for r in out if r.k_bucket is None]
    # every damaged row is PRESENT (no abort, no silent drop), grouped
    # under the NULL bucket with NULL aggregates where k was NULL
    assert sum(r.cnt for r in null_rows) == 4
    assert all(r.sum_k is None and r.max_k is None for r in null_rows)
    good = [r for r in out if r.k_bucket is not None]
    assert len(good) == 1 and good[0].cnt == 1 and good[0].sum_k == 7


def test_from_json_agrees_with_get_json_object(spark):
    props = ['{"k": %d}' % (i * 37 % 101) for i in range(50)]
    props += ["broken", '{"k": null}', '{}']
    ev = _events(spark, props)
    via_schema = json_props_agg(ev)
    via_path = (
        ev.select("event_type",
                  F.get_json_object("props", "$.k").cast("long").alias("k"))
        .groupBy("event_type", (F.col("k") % 10).alias("k_bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum("k").alias("sum_k"),
             F.max("k").alias("max_k"))
    )
    from collections import Counter
    assert Counter(map(tuple, via_schema.collect())) == \
        Counter(map(tuple, via_path.collect()))


def test_extraction_is_jvm_projection_single_shuffle(spark):
    ev = _events(spark, ['{"k": 1}'] * 8)
    plan = json_props_agg(ev)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in plan and plan.count("Exchange") == 1
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
