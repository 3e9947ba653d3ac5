"""JSONL / quoted-CSV sources (sources/textfiles.py).

The driver row (`source_roundtrips` 'jsonl'/'csv' legs) hash-pins the
happy-path byte-exact round-trip at three SFs; these tests pin what the
row can't: the PERMISSIVE corrupt-record quarantine path, NULL
round-tripping, and that JSONL ingestion fans out across splits (the
scale property the module docstring promises).
"""

import json
import os

from cloudbrush_spark.sources import textfiles

NASTY = [
    (1, 'plain words'),
    (2, 'comma, "quote" and \'single\''),
    (3, 'tab\there and\nnewline'),
    (4, 'unicode é ✓ 中文'),
    (5, None),  # NULL text
]
SCHEMA = "doc_id long, text string"


def _df(spark):
    return spark.createDataFrame(NASTY, SCHEMA)


def _roundtrip(spark, tmp_path, writer, reader, **kw):
    d = str(tmp_path / "out")
    writer(_df(spark), d)
    got = {r.doc_id: r.text for r in reader(spark, d, SCHEMA, **kw).collect()}
    return got


def test_jsonl_roundtrip_nasty_strings_and_null(spark, tmp_path):
    got = _roundtrip(spark, tmp_path,
                     textfiles.write_jsonl, textfiles.read_jsonl)
    # Spark's json sink DROPS null fields from the object; the explicit
    # schema reads the absent key back as NULL — byte-exact for values,
    # null-exact for nulls
    assert got == {i: t for i, t in NASTY}


def test_csv_roundtrip_nasty_strings(spark, tmp_path):
    got = _roundtrip(spark, tmp_path,
                     textfiles.write_csv_quoted, textfiles.read_csv_quoted)
    # CSV cannot distinguish NULL from empty at the byte level with the
    # default conventions; the non-null rows must be byte-exact
    for i, t in NASTY:
        if t is not None:
            assert got[i] == t


def test_jsonl_corrupt_lines_are_quarantined_not_dropped(spark, tmp_path):
    d = str(tmp_path / "mixed")
    os.makedirs(d)
    with open(os.path.join(d, "part-0.json"), "w") as fh:
        fh.write(json.dumps({"doc_id": 10, "text": "good"}) + "\n")
        fh.write("{broken json\n")
        fh.write(json.dumps({"doc_id": 11, "text": "also good"}) + "\n")
    back = textfiles.read_jsonl(spark, d, SCHEMA, keep_corrupt=True)
    rows = back.collect()
    assert len(rows) == 3  # nothing dropped, nothing aborted
    bad = [r for r in rows if r[textfiles.CORRUPT_COL] is not None]
    assert len(bad) == 1 and bad[0].doc_id is None
    good = sorted(r.doc_id for r in rows if r[textfiles.CORRUPT_COL] is None)
    assert good == [10, 11]


def test_jsonl_scan_splits_across_tasks(spark, tmp_path):
    # one physical file, many splits: the scan's partition count must
    # exceed 1 for a file much larger than maxPartitionBytes — proxied
    # here by lowering the conf for a single read
    d = str(tmp_path / "big")
    os.makedirs(d)
    with open(os.path.join(d, "big.json"), "w") as fh:
        for i in range(20000):
            fh.write(json.dumps({"doc_id": i, "text": "x" * 50}) + "\n")
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(64 * 1024))
    try:
        df = textfiles.read_jsonl(spark, d, SCHEMA)
        assert df.rdd.getNumPartitions() > 1
        assert df.count() == 20000
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


# --- hypothesis: arbitrary-content round-trips ------------------------------

import tempfile

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

# printable + control chars + non-BMP, no surrogates (not encodable)
_JSON_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=80)
# CSV: univocity normalizes bare \r inside quoted fields and NUL is
# format-hostile; everything else must survive byte-exact
_CSV_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",),
                           blacklist_characters="\r\x00"), max_size=80)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_JSON_TEXT, min_size=1, max_size=20))
def test_jsonl_roundtrip_property(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), SCHEMA)
    d = tempfile.mkdtemp(prefix="jsonl_prop_")
    textfiles.write_jsonl(df, d, files=1)
    got = {r.doc_id: r.text for r in
           textfiles.read_jsonl(spark, d, SCHEMA).collect()}
    # JSON drops null fields; empty string is NOT null and must survive
    assert got == dict(enumerate(texts))


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(texts=st.lists(_CSV_TEXT, min_size=1, max_size=20))
def test_csv_roundtrip_property(spark, texts):
    df = spark.createDataFrame(list(enumerate(texts)), SCHEMA)
    d = tempfile.mkdtemp(prefix="csv_prop_")
    textfiles.write_csv_quoted(df, d, files=1)
    got = {r.doc_id: r.text for r in
           textfiles.read_csv_quoted(spark, d, SCHEMA).collect()}
    # CSV's one lossy corner: the empty string reads back as NULL
    want = {i: (t if t != "" else None) for i, t in enumerate(texts)}
    assert got == want


def test_jsonl_gz_reads_transparently(spark, tmp_path):
    """Crawl dumps usually arrive gzipped; the Hadoop codec picks .gz up
    by extension.  gzip is NOT splittable — parallelism = file count
    (each file one task), which is why the scan must accept a DIRECTORY
    of shards, pinned here with two files."""
    import gzip
    import json
    d = str(tmp_path / "gz")
    os.makedirs(d)
    for f in range(2):
        with gzip.open(os.path.join(d, f"dump{f}.jsonl.gz"), "wt") as fh:
            for i in range(50):
                fh.write(json.dumps(
                    {"doc_id": 100 * f + i, "text": f"doc {100 * f + i}"}) + "\n")
    df = textfiles.read_jsonl(spark, d, SCHEMA)
    assert df.count() == 100
    assert df.rdd.getNumPartitions() == 2  # one unsplittable task per file
    assert df.filter("doc_id = 149").collect()[0].text == "doc 149"


def test_jsonl_scan_prunes_columns(spark, tmp_path):
    """Explicit-schema JSON scans support column pruning: a projection of
    one field must reach the scan as ReadSchema with only that field —
    at 100 TB the parse skips the other keys instead of materializing
    them."""
    d = str(tmp_path / "prune")
    os.makedirs(d)
    with open(os.path.join(d, "p.json"), "w") as fh:
        fh.write(json.dumps({"doc_id": 1, "text": "hello"}) + "\n")
    df = textfiles.read_jsonl(spark, d, SCHEMA).select("text")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<text:string>" in plan


def test_orc_roundtrip_byte_exact_and_nulls(spark, tmp_path):
    from cloudbrush_spark.sources import textfiles
    rows = [
        (1, ' |"q,uote"\t\nmixed \'line\'|é', "en"),
        (2, "", "de"),          # empty string stays empty (not NULL)
        (3, None, None),        # NULLs survive
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    d = str(tmp_path / "orc")
    textfiles.write_orc(df, d)
    back = {r.doc_id: (r.text, r.lang) for r in textfiles.read_orc(
        spark, d, "doc_id long, text string, lang string").collect()}
    assert back[1] == (' |"q,uote"\t\nmixed \'line\'|é', "en")
    assert back[2] == ("", "de")
    assert back[3] == (None, None)


def test_orc_scan_pushes_filters_and_prunes_columns(spark, tmp_path):
    from cloudbrush_spark.sources import textfiles
    df = spark.createDataFrame(
        [(i, f"t{i}", "en") for i in range(100)],
        "doc_id long, text string, lang string")
    d = str(tmp_path / "orc_push")
    textfiles.write_orc(df, d)
    q = (textfiles.read_orc(spark, d, "doc_id long, text string, lang string")
         .filter("doc_id > 50").select("doc_id"))
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "doc_id" in plan.split("PushedFilters")[1][:80]
    assert "ReadSchema" in plan and "text" not in plan.split("ReadSchema")[1][:120]
