"""Plan-shape tests: the scale guarantees (pushdown, pruning, broadcast)
pinned as assertions via cloudbrush_spark.plans."""

import os

import pytest
from pyspark.sql import functions as F

from cloudbrush_spark import plans

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def part(spark):
    return spark.read.parquet(os.path.join(SF, "part.parquet"))


def test_filter_pushdown_reaches_scan(part):
    q = part.filter(F.col("p_size") > 40).select("p_partkey")
    pushed = plans.pushed_filters(q)
    assert pushed and "p_size" in pushed[0]


def test_column_pruning_reaches_scan(part):
    q = part.select("p_partkey", "p_size")
    schemas = plans.read_schema(q)
    assert schemas and "p_name" not in schemas[0] and "p_partkey" in schemas[0]


def test_small_dim_join_broadcasts(spark, part):
    orders = spark.read.parquet(os.path.join(SF, "orders.parquet"))
    customer = spark.read.parquet(os.path.join(SF, "customer.parquet"))
    q = orders.join(
        F.broadcast(customer.filter(F.col("c_mktsegment") == "BUILDING")),
        orders.o_custkey == customer.c_custkey)
    assert plans.has_broadcast_join(q)


def test_two_phase_n50_histogram_before_any_global_exchange(spark):
    """The N50 scan must reduce to the size histogram BEFORE any
    single-partition exchange: the plan's SinglePartition exchange (the
    final tiny scan) sits above a hash aggregate, never directly above the
    row-level scan."""
    from cloudbrush_spark.operators import stats
    df = spark.range(0, 10000).select((F.col("id") % 97).alias("sz"))
    plan = plans.explain_str(stats.n50(df, "sz"))
    first_single = plan.find("SinglePartition")
    first_agg = plan.find("HashAggregate")
    assert first_agg != -1
    # a hash aggregate exists, and hash-partitioned exchanges appear in the
    # plan (the histogram shuffle) — the global exchange only carries
    # aggregated rows
    assert "hashpartitioning(sz" in plan or "hashpartitioning(bkt" in plan


def test_asof_join_avoids_nested_loop(spark):
    """The as-of join must plan as union + window (one hash shuffle), never
    a range-condition join (which Spark plans as broadcast nested loop)."""
    from cloudbrush_spark.operators import joins
    left = spark.createDataFrame([("u", 100)], "k string, lts long")
    right = spark.createDataFrame([("u", 90)], "k string, rts long")
    plan = plans.explain_str(joins.asof_join(left, right, "k", "lts", "rts"))
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan
    assert "Window" in plan


def test_overlap_posting_join_never_broadcasts_postings(spark):
    """Regression guard for the 5 GiB broadcast: Catalyst's Generate
    (explode) size estimate is its CHILD's size, so without the explicit
    shuffle_hash pin the planner broadcast the ~100x-exploded posting
    table.  The J1 candidate join must stay a shuffled join; the only
    BroadcastExchanges allowed in match_prefix are the tiny hot-key /
    blacklist anti-join sides."""
    from cloudbrush_spark import oracle_fixtures as gfx
    from cloudbrush_spark.operators import overlap

    reads = gfx.overlap_reads(spark, SF)
    plan = plans.explain_str(overlap.match_prefix(reads, 24))
    assert "ShuffledHashJoin" in plan
    # every inner join in the candidate path is the posting join — none
    # of them may be broadcast (the LeftAnti joins against the tiny
    # hot-key set are the only broadcasts allowed)
    assert "BroadcastHashJoin Inner" not in plan, "posting join became broadcast"


def test_tpch_q6_filters_reach_parquet_scan(spark):
    """The Q6-shaped narrow-predicate aggregate is THE pushdown showcase:
    date/quantity predicates must reach the parquet scan as PushedFilters
    and the scan schema must carry only the referenced columns."""
    import __spark_entry__ as entrymod
    q = entrymod.q_tpch_q6(spark, SF)
    pushed = " ".join(plans.pushed_filters(q))
    assert "l_shipdate" in pushed and "l_quantity" in pushed
    schemas = plans.read_schema(q)
    assert schemas and "l_comment" not in schemas[0]


def test_vector_lsh_cap_broadcasts_and_avoids_nested_loop(spark):
    """The round-7 vector-LSH candidate machinery: on a well-spread corpus
    the collected over-cap list is EMPTY and the whole cap/level-2 branch
    is skipped driver-side (no broadcast join needed); on a hot-direction
    corpus the cap filters plan as BROADCAST joins (the over-cap list is
    tiny by construction).  In both regimes no join may fall back to a
    broadcast nested loop — everything is an equi-join on bucket keys or
    ids."""
    import random as pyrandom

    from cloudbrush_spark.operators import similarity
    rng = pyrandom.Random(3)
    # regime 1: spread-out vectors, no bucket over the cap
    rows = [(i, [rng.gauss(0, 1) for _ in range(8)]) for i in range(300)]
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    _, groups = similarity._collapse(vecs, "vec_id", "embedding")
    cand = similarity._capped_rep_pairs(groups, dim=8, planes=4, seed=7,
                                        tables=2, max_bucket=50,
                                        star_overcap=True)
    plan = plans.explain_str(cand)
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    # regime 2: one tight direction cluster blows the cap
    hot_rows = [(i, [10.0 + rng.gauss(0, 0.01), 20.0 + rng.gauss(0, 0.01),
                     30.0 + rng.gauss(0, 0.01), 40.0 + rng.gauss(0, 0.01)])
                for i in range(200)]
    hot = spark.createDataFrame(hot_rows, "vec_id long, embedding array<double>")
    _, hgroups = similarity._collapse(hot, "vec_id", "embedding")
    hcand = similarity._capped_rep_pairs(hgroups, dim=4, planes=4, seed=7,
                                         tables=2, max_bucket=20,
                                         star_overcap=True)
    hplan = plans.explain_str(hcand)
    assert plans.has_broadcast_join(hcand)
    assert "BroadcastNestedLoopJoin" not in hplan
    assert "CartesianProduct" not in hplan


def test_pii_scrub_is_shuffle_free(spark):
    """PII scrub must stay a pure narrow projection — zero exchanges."""
    from cloudbrush_spark.operators import guard
    docs = spark.createDataFrame([(1, "a@b.co x")], "doc_id long, text string")
    assert plans.shuffle_count(guard.pii_scrub(docs)) == 0


def test_semantic_decontaminate_is_shuffle_free(spark):
    """Semantic decontamination must be one narrow Arrow pass — the
    benchmark matrix travels as a broadcast VARIABLE (not a join), so the
    plan has zero exchanges and zero joins of any kind."""
    from cloudbrush_spark.operators import guard
    vecs = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])],
        "vec_id long, embedding array<float>")
    bench = spark.createDataFrame(
        [(9, [1.0, 0.0])], "vec_id long, embedding array<float>")
    q = guard.semantic_decontaminate(vecs, bench)
    assert plans.shuffle_count(q) == 0
    plan = plans.explain_str(q)
    assert "Join" not in plan
    assert "MapInPandas" in plan or "mapInPandas" in plan.lower()


def test_decontaminate_corpus_side_has_single_aggregation_shuffle(spark):
    """The corpus side of decontamination joins the benchmark grams by
    BROADCAST (never a shuffled join) — the only exchanges are the per-doc
    hit aggregate (plus the final left join back to the doc universe)."""
    from cloudbrush_spark.operators import guard
    docs = spark.createDataFrame(
        [(i, "a b c d e f") for i in range(4)], "doc_id long, text string")
    bench = spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string")
    q = guard.decontaminate(docs, bench, n=5)
    assert plans.has_broadcast_join(q)
    plan = plans.explain_str(q)
    # no sort-merge join anywhere on the gram-matching path
    assert "SortMergeJoin" not in plan or "gh" not in plan.split("SortMergeJoin")[1][:200]


def test_pack_shards_no_global_single_partition_sort_on_rows(spark):
    """pack_shards' only SinglePartition window must be over the
    bucket-totals frame (buckets rows), never the row-level data: the
    row-level window is partitioned by bucket."""
    from cloudbrush_spark.operators import sampling
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 30 + 1).alias("n_tokens"))
    q = sampling.pack_shards(df, "n_tokens", budget=100, buckets=16)
    plan = plans.explain_str(q)
    # the bucket-prefix frame reaches the row side through a broadcast
    assert plans.has_broadcast_join(q)
    # row-level cumsum window is hash-partitioned by bucket
    assert "hashpartitioning(b" in plan


def test_budget_select_prunes_buckets_before_the_row_sort(spark):
    """budget_select's row-level cumsum window is partitioned by the
    quality range bucket (never SinglePartition), the surviving bucket
    list reaches the rows by BROADCAST, and the budget prune (pre <=
    budget) sits on the bucket-totals side of that join — so buckets
    past the budget are dropped before any per-bucket sort happens."""
    from cloudbrush_spark.operators import sampling
    df = spark.range(0, 1000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 30 + 1).alias("n_tokens"),
        ((F.col("id") % 13) / 12.0).alias("quality"))
    q = sampling.budget_select(df, "n_tokens", "quality", budget=500,
                               buckets=16)
    plan = plans.explain_str(q)
    assert plans.has_broadcast_join(q)
    assert "hashpartitioning(b" in plan
    # the prune filter references the bucket prefix, not row columns
    assert "(pre" in plan and "500" in plan


def test_mixture_resample_is_narrow(spark):
    """Mixture construction (filter + bounded explode) must add no
    exchange — reweighting a 100 TB corpus is a single linear pass."""
    from cloudbrush_spark.operators import sampling
    df = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, source string")
    q = sampling.mixture_resample(df, {"a": 2.5, "b": 0.3})
    assert plans.shuffle_count(q) == 0


def test_tpch_semi_and_anti_legs_plan_as_semi_anti_joins(spark):
    """The r8 TPC-H legs must keep their set-operation shapes: q4's
    EXISTS plans as a LEFT SEMI join (match multiplicity never
    materialized), q16's supplier blacklist and q22's NOT EXISTS plan as
    LEFT ANTI joins — never inner-join + distinct, which would shuffle
    the full match fan-out at 100 TB."""
    import __spark_entry__ as entry
    q4 = plans.explain_str(entry.q_tpch_q4(spark, SF))
    assert "LeftSemi" in q4
    q16 = plans.explain_str(entry.q_tpch_q16(spark, SF))
    assert "LeftAnti" in q16 and plans.has_broadcast_join(
        entry.q_tpch_q16(spark, SF))
    q22 = plans.explain_str(entry.q_tpch_q22(spark, SF))
    assert "LeftAnti" in q22


def test_boilerplate_scrub_no_nested_loop_no_global_exchange(spark):
    """The line scrub must stay a partitioned groupBy/join chain: no
    broadcast nested loop, no SinglePartition exchange — a global
    bottleneck here would serialize the whole corpus through one task."""
    from cloudbrush_spark.operators import guard
    df = spark.createDataFrame(
        [(1, "a\nb"), (2, "b\nc")], "doc_id long, text string")
    plan = plans.explain_str(guard.boilerplate_scrub(df))
    assert "BroadcastNestedLoop" not in plan
    assert "SinglePartition" not in plan


def test_tpch_r9_legs_keep_their_join_shapes(spark):
    """q21's correlated EXISTS / NOT EXISTS must plan as one LEFT SEMI
    plus one LEFT ANTI on the order-key self-join (never inner+distinct
    — the match fan-out of a 7-line order would shuffle 7x at 100 TB);
    q15's scalar max and q19's part dimension must broadcast."""
    import __spark_entry__ as entry
    q21 = plans.explain_str(entry.q_tpch_q21(spark, SF))
    assert "LeftSemi" in q21 and "LeftAnti" in q21
    q15 = plans.explain_str(entry.q_tpch_q15(spark, SF))
    assert "BroadcastNestedLoopJoin" in q15 or "BroadcastExchange" in q15
    assert plans.has_broadcast_join(entry.q_tpch_q19(spark, SF))
    # q8: the region-restricted customer set must stay a broadcast LEFT
    # SEMI (an inner join would duplicate fact rows for no reason and a
    # shuffled semi would move the 100 TB fact for a dimension filter);
    # every dimension chain broadcasts.
    q8 = plans.explain_str(entry.q_tpch_q8(spark, SF))
    assert "LeftSemi" in q8 and "BroadcastExchange" in q8
    # q9: part carries p_retailprice through the aggregate — the part
    # and supplier dims must broadcast, never shuffle the fact twice.
    q9 = plans.explain_str(entry.q_tpch_q9(spark, SF))
    assert "BroadcastExchange" in q9


def test_pack_sequences_single_exchange_no_global_sort(spark):
    """pack_sequences must keep pack_shards' two-phase shape: the only
    unpartitioned window is the buckets-row totals frame; the corpus
    itself never passes through a SinglePartition exchange or a global
    Sort."""
    from cloudbrush_spark.operators import sampling
    df = spark.createDataFrame(
        [(i, i % 50 + 1) for i in range(200)], "doc_id long, n_tokens long")
    plan = plans.explain_str(
        sampling.pack_sequences(df, "n_tokens", max_len=64, buckets=8))
    # the bucket-totals frame is the one allowed SinglePartition window;
    # it must be fed by the AGGREGATED buckets-row frame, never the rows
    segs = plan.split("SinglePartition")
    assert len(segs) <= 2
    if len(segs) == 2:
        assert "HashAggregate" in segs[0].rsplit("Exchange", 2)[-2] \
            or "HashAggregate" in plan.split("SinglePartition")[0][-2000:]


def test_stratified_sample_prunes_and_never_single_partitions(spark):
    """stratified_sample's corpus-side work must stay partitioned: the
    only unpartitioned frame is the bounded (source x bucket) prefix
    window — the corpus itself never crosses a SinglePartition exchange
    or a global Sort, and the bucket prune keeps past-n buckets out of
    the rank entirely."""
    from cloudbrush_spark.operators import sampling
    df = spark.createDataFrame(
        [(i, f"s{i % 4}") for i in range(400)], "doc_id long, source string")
    plan = plans.explain_str(sampling.stratified_sample(df, 5))
    # the in-bucket rank partitions by (source, bucket); a global Sort of
    # the corpus would show as Sort [h ...] with no partitioning
    assert "SinglePartition" not in plan.split("cnt")[0]  # corpus side
    assert plan.count("Window") >= 1


def test_quantized_codes_selection_scan_never_reads_doubles(spark, tmp_path):
    """The persisted-codes ANN's byte lever, pinned in the plan: the
    codes-table scan's ReadSchema carries q_codes (tinyint array) and NO
    double embedding column, and the doubles table is touched only by
    the re-rank — with the bounded winner-id list pushed into its scan
    as an In() filter for row-group pruning."""
    import random as _rnd
    from cloudbrush_spark.operators import similarity
    rng = _rnd.Random(11)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    vec_path, codes_path = str(tmp_path / "v"), str(tmp_path / "c")
    df.write.parquet(vec_path)
    vecs = spark.read.parquet(vec_path)
    similarity.write_quantized_codes(vecs, codes_path)
    codes = similarity.read_quantized_codes(spark, codes_path)
    q = vecs.filter(F.col("vec_id") < 3)
    # query side as a literal frame (the 100 TB shape: queries broadcast
    # from the driver) so the only file scan in the selection plan is the
    # codes table itself
    qrows = similarity.quantize_embeddings(q).select("vec_id", "q_codes") \
        .collect()
    qq = spark.createDataFrame(
        [(int(r.vec_id), list(r.q_codes)) for r in qrows],
        "query_id long, qc array<tinyint>").withColumn("qcn", F.lit(1.0))
    sel = similarity.quantized_select(codes, qq, 4)
    sel_schemas = plans.read_schema(sel)
    assert sel_schemas and any("q_codes" in s for s in sel_schemas)
    assert all("embedding" not in s and "array<double>" not in s
               for s in sel_schemas), sel_schemas
    # the doubles scan exists only for the re-rank and carries the In()
    # winner filter (parquet row-group pruning)
    out = similarity.cosine_topk_quantized(vecs, q, k=4, codes=codes)
    pushed = plans.pushed_filters(out)
    assert any("In(vec_id" in p for p in pushed), pushed


def test_ivf_quantized_probe_prunes_partitions_and_reads_codes_only(
        spark, tmp_path):
    """The composed (r11) index multiplies the two persisted levers ON
    THE SAME SCAN: the selection scan carries a PartitionFilter on the
    probed buckets (unprobed directories never listed) AND a ReadSchema
    with q_codes and NO double column (int8 bytes inside the probed
    partitions); the doubles side table is touched only by the re-rank,
    with the In() winner filter pushed for row-group pruning."""
    import random as _rnd
    from cloudbrush_spark.operators import similarity
    rng = _rnd.Random(7)
    centers = [[8 * (1 if i == c else 0) for i in range(8)] for c in range(4)]
    rows = []
    for vid in range(200):
        ctr = centers[vid % 4]
        rows.append((vid, [x + rng.uniform(-0.4, 0.4) for x in ctr]))
    vecs = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    path = str(tmp_path / "ivfq")
    similarity.write_ivf_index(vecs, path, n_centroids=8, seed=42,
                               quantized=True)
    q = vecs.filter(F.col("vec_id") < 2)
    # the selection stage (the full probe stage-cuts the winner frame,
    # severing the selection plan from the output's — pin it directly)
    _, sel = similarity.ivf_quantized_select(spark, path, q, k=3, nprobe=2)
    plan = plans.explain_str(sel)
    assert "PartitionFilters" in plan and "bucket" in \
        plan.split("PartitionFilters", 1)[1][:200], plan
    # the codes scan (the /vectors one) must not read any double column
    schemas = plans.read_schema(sel)
    codes_scans = [s for s in schemas if "q_codes" in s]
    assert codes_scans and all(
        "array<double>" not in s for s in codes_scans), schemas
    # full probe: the /doubles scan exists only behind the In() re-rank
    out = similarity.cosine_topk_ivf_quantized(spark, path, q, k=3, nprobe=2)
    pushed = plans.pushed_filters(out)
    assert any("In(vec_id" in p for p in pushed), pushed
