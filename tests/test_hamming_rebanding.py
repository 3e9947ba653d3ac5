"""Banded Hamming pair recall vs brute force with level-2 re-banding
FORCED (tiny bucket_cap), for both chunk configs (operators/dedup.py).

The sf-scale oracles exercise the hot path only when the corpus happens
to produce an over-cap bucket; here every bucket is over cap, so every
pair must be recovered through the rotated sub-chunk re-band."""

import random

from pyspark.sql import functions as F

from cloudbrush_spark.operators import dedup


def _mk_hot_chunk_sigs(seed, n, n_paired, max_hamming, chunk_width):
    """Signatures that all agree on chunk 0 (bits 0..chunk_width-1) but
    are random elsewhere: the chunk-0 bucket goes over cap and must
    re-band, while the rotated sub-chunks stay diverse so SECOND-level
    buckets remain under cap (the operator's exactness contract).  For
    ``n_paired`` of them add a partner within the Hamming budget —
    partners whose flips hit chunk 0 leave the hot bucket and must be
    recovered through some other shared chunk at level 1."""
    rnd = random.Random(seed)
    mask = (1 << chunk_width) - 1
    marker = 0xAB & mask
    sigs = []
    for _ in range(n):
        sigs.append((rnd.getrandbits(64) & ~mask) | marker)
    for i in range(n_paired):
        flipped = sigs[i]
        for bit in rnd.sample(range(64), rnd.randint(1, max_hamming)):
            flipped ^= 1 << bit
        sigs.append(flipped)
    return sigs


def _brute(sigs, max_hamming):
    # id-level pairs, including hamming-0 pairs of distinct ids sharing a
    # signature (the operator emits those via its identical-signature join)
    out = set()
    for i in range(len(sigs)):
        for j in range(i + 1, len(sigs)):
            if bin(sigs[i] ^ sigs[j]).count("1") <= max_hamming:
                out.add((i, j))
    return out


def _spark_pairs(spark, sigs, max_hamming, bucket_cap):
    rows = [(i, s >> 32, s & 0xFFFFFFFF) for i, s in enumerate(sigs)]
    df = spark.createDataFrame(rows, "id long, sim_hi long, sim_lo long")
    got = dedup.hamming_near_pairs(
        df, "id", max_hamming=max_hamming, bucket_cap=bucket_cap).collect()
    return {(min(r.a, r.b), max(r.a, r.b)) for r in got}


def test_forced_level2_exact_recall_8x8(spark):
    # 60 sigs share chunk 0 -> that bucket (cap 10) must re-band; random
    # high bits keep every sub-bucket under cap, so recall must be exact
    sigs = _mk_hot_chunk_sigs(seed=1, n=60, n_paired=15, max_hamming=7,
                              chunk_width=8)
    assert _spark_pairs(spark, sigs, 7, bucket_cap=10) == _brute(sigs, 7)


def test_forced_level2_exact_recall_4x16(spark):
    sigs = _mk_hot_chunk_sigs(seed=2, n=60, n_paired=15, max_hamming=3,
                              chunk_width=16)
    assert _spark_pairs(spark, sigs, 3, bucket_cap=10) == _brute(sigs, 3)


def test_unforced_matches_brute_force(spark):
    sigs = _mk_hot_chunk_sigs(seed=3, n=40, n_paired=10, max_hamming=7,
                              chunk_width=8)
    assert _spark_pairs(spark, sigs, 7, bucket_cap=1000) == _brute(sigs, 7)


def test_thousands_of_hot_buckets_distributed_cap_list(spark, monkeypatch):
    """Over-cap guard: when the over-cap bucket list itself is too large
    to collect (thousands of hot buckets vs a lowered driver threshold),
    the cap list stays distributed — and the pair output is IDENTICAL to
    the collect-path plan."""
    rnd = random.Random(17)
    # 700 random 64-bit sigs: each of the 8 chunks has 256 possible 8-bit
    # values, so expected bucket occupancy ~2.7 — with bucket_cap=1
    # essentially every occupied (c, v) bucket is over cap
    sigs = [rnd.getrandbits(64) for _ in range(700)]
    hot = (
        spark.createDataFrame(
            [(i, s >> 32, s & 0xFFFFFFFF) for i, s in enumerate(sigs)],
            "id long, sim_hi long, sim_lo long")
        .select(F.explode(F.array(*[
            F.struct(F.lit(c).alias("c"),
                     F.shiftright("sim_hi" if c < 4 else "sim_lo",
                                  (c % 4) * 8).bitwiseAND(F.lit(0xFF))
                     .alias("v")) for c in range(8)])).alias("ch"))
        .groupBy("ch.c", "ch.v").count().filter(F.col("count") > 1).count())
    assert hot > 1500  # the fixture really produces thousands of hot buckets

    collected = _spark_pairs(spark, sigs, 7, bucket_cap=1)
    monkeypatch.setattr(dedup, "OVERCAP_COLLECT_MAX", 100)
    distributed = _spark_pairs(spark, sigs, 7, bucket_cap=1)
    assert distributed == collected
