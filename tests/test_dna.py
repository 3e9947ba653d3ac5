"""DNA expression kit unit + property tests (SURVEY §7 risk 2: the
orientation algebra is where the reference's bugs lived — test it hard)."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from cloudbrush_spark.functions import dna

SEQ = st.text(alphabet="ACGT", min_size=1, max_size=60)


def test_rc_py_basics():
    assert dna.rc_py("ACGT") == "ACGT"  # palindrome
    assert dna.rc_py("AAA") == "TTT"
    assert dna.rc_py("ACG") == "CGT"


@given(SEQ)
@settings(max_examples=200, deadline=None)
def test_rc_py_involution(s):
    assert dna.rc_py(dna.rc_py(s)) == s


def test_flip_algebra():
    assert dna.flip_dir_py("f") == "r" and dna.flip_dir_py("r") == "f"
    for et in ("ff", "fr", "rf", "rr"):
        assert dna.flip_link_py(dna.flip_link_py(et)) == et
    assert dna.flip_link_py("ff") == "rr"
    assert dna.flip_link_py("fr") == "fr"
    assert dna.flip_link_py("rf") == "rf"


def test_spark_rc_matches_python(spark):
    seqs = ["ACGT", "A", "GATTACA", "TTTTAA", "ACGTACGTACGT"]
    df = spark.createDataFrame([(s,) for s in seqs], "seq string")
    got = df.select("seq", dna.rc("seq").alias("rc")).collect()
    for row in got:
        assert row.rc == dna.rc_py(row.seq)


def test_canonical_is_min(spark):
    df = spark.createDataFrame([("TTT",), ("AAA",), ("ACG",)], "seq string")
    got = [r[0] for r in df.select(dna.canonical("seq")).collect()]
    assert got == ["AAA", "AAA", "ACG"]


def test_kmers_windows(spark):
    df = spark.createDataFrame([("ACGTA",)], "seq string")
    got = df.select(F.explode(dna.kmers("seq", 3)).alias("k")).collect()
    assert [r.k for r in got] == ["ACG", "CGT", "GTA"]


def test_str_concat(spark):
    df = spark.createDataFrame([("ACGTT", "GTTAC", 3)], "a string, b string, ov int")
    got = df.select(dna.str_concat(F.col("a"), F.col("b"), F.col("ov")).alias("m")).collect()
    assert got[0].m == "ACGTTAC"
