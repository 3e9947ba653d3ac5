"""A8 PreCorrect voting + correction application."""

from pyspark.sql import functions as F

from cloudbrush_spark.operators import consensus


def test_precorrect_fixes_minority_base(spark):
    # 12 copies of the clean read, 1 with a single error in the middle;
    # spaced-seed voting must emit exactly the fix for the error position
    clean = "ACGTACGGTTCAGCATTGACCGGTAACGTCAGCAA"   # 35 bp
    err_base = next(b for b in "ACGT" if b != clean[17])
    err = clean[:17] + err_base + clean[18:]       # single error at pos 17
    reads = [(f"r{i}_1", clean) for i in range(12)] + [("bad_1", err)]
    df = spark.createDataFrame(reads, "read_id string, seq string")
    fixes = consensus.precorrect(df).collect()
    assert len(fixes) >= 1
    assert all(f.read_id == "bad_1" for f in fixes)
    target = [f for f in fixes if f.pos == 17]
    assert target and target[0].from_base == err_base and target[0].to_base == clean[17]

    fixed = consensus.apply_corrections(df, spark.createDataFrame(fixes))
    out = {r.read_id: r.seq for r in fixed.collect()}
    assert out["bad_1"][17] == clean[17]
    assert out["r0_1"] == clean                     # untouched reads pass through


def test_apply_corrections_multiple_positions(spark):
    df = spark.createDataFrame([("x", "AAAAAAAAAA")], "read_id string, seq string")
    fixes = spark.createDataFrame(
        [("x", 0, "C"), ("x", 9, "T"), ("x", 4, "G")],
        "read_id string, pos int, to_base string")
    out = consensus.apply_corrections(df, fixes).collect()[0].seq
    assert out == "CAAAGAAAAT"
