"""End-to-end curation composite: gate -> exact dedup -> cluster dedup ->
split (pipeline/curation.py), semantic checks on a hand-built corpus."""

from pyspark.sql import functions as F

from cloudbrush_spark.pipeline import curation

GOOD = ("the quick brown fox jumps over the lazy dog and it runs to the "
        "river in the morning for a drink of water that is cold and clear")
GOOD2 = ("a completely different story about the sea and the ships that "
         "sail in it for trade and for glory with cargo of spice and silk "
         "that is carried to the ports")


def _docs(spark):
    rows = [
        (1, GOOD),                                  # keeper, cluster rep
        (2, GOOD.upper() + "!!"),                   # exact dup of 1 (normalized)
        (3, GOOD + " extra trailing words here"),   # near-dup of 1 (J > 0.5)
        (4, GOOD2),                                 # independent keeper
        (5, "too short"),                           # gate: length
        (6, "le chat est dans la maison et il est pour la nuit que les "
            "autres une pour dans pas le la les et est une pour dans"),  # gate: lang
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_curate_stages(spark):
    out = curation.curate(_docs(spark)).collect()
    by_id = {r.doc_id: r for r in out}
    # survivors: 1 (rep of {1,2,3}) and 4; everything else dropped
    assert set(by_id) == {1, 4}
    for r in out:
        assert r.split in ("train", "val", "test")
        assert r.quality >= 0.5
        assert r.ws_tokens >= 10


def test_curate_split_stable_under_repartition(spark):
    docs = _docs(spark)
    a = {r.doc_id: r.split for r in curation.curate(docs).collect()}
    b = {r.doc_id: r.split
         for r in curation.curate(docs.repartition(7)).collect()}
    assert a == b


def test_curate_near_dup_keeps_min_id(spark):
    # swap ids so the near-dup has the SMALLER id: rep must follow min-id
    rows = [(10, GOOD), (3, GOOD + " extra trailing words here"), (7, GOOD2)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r.doc_id for r in curation.curate(docs).collect()}
    assert kept == {3, 7}


def test_mass_near_dup_cluster_over_lsh_cap_is_deduplicated(spark):
    # 60 near-identical template docs (unique trailing token) — distinct
    # fingerprints, so exact dedup keeps all 60; they flood the LSH band
    # buckets past max_bucket=50, which the PAIR product drops whole.
    # curation's overcap='star' path must still collapse them to one
    # representative via verified (rep, member) candidates.
    rows = [(i, GOOD + f" trailer{i}") for i in range(60)]
    rows.append((100, GOOD2))  # independent keeper
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    kept = {r.doc_id for r in curation.curate(docs).collect()}
    assert 100 in kept
    assert 0 in kept  # min-id representative of the template cluster
    # LSH recall is probabilistic per band (a variant whose trailer
    # perturbs all 4 band keys pairs with nobody — observed: doc 52),
    # so assert near-complete collapse, not perfection: >=57 of the 59
    # variants must be gone.  Under overcap='drop' (the pre-fix
    # behavior) EVERY bucket is over cap and all 60 survive.
    assert len(kept) <= 4


def test_curate_with_benchmark_decontamination(spark):
    """A gated doc sharing a decontam_n-gram with the benchmark is dropped
    before dedup; the unrelated keeper survives."""
    docs = _docs(spark)
    bench = spark.createDataFrame(
        [(100, GOOD)], "doc_id long, text string")  # eval set contains doc 1's text
    out = curation.curate(docs, benchmark=bench, decontam_n=8)
    kept = {r.doc_id for r in out.collect()}
    # docs 1/2/3 all share GOOD's 8-grams with the benchmark -> gone;
    # GOOD2 (doc 4) survives the whole pipeline
    assert kept == {4}
    # without the benchmark the normal result includes the cluster rep
    base = {r.doc_id for r in curation.curate(docs).collect()}
    assert base == {1, 4}


def test_curate_with_semantic_decontamination(spark):
    """A gated doc whose embedding is near a benchmark embedding is
    dropped before dedup (paraphrase contamination the n-gram rule
    misses); vectors for docs the gate already dropped are irrelevant."""
    docs = _docs(spark)
    # doc 4's embedding sits on the benchmark direction; doc 1's is
    # orthogonal.  Ids key on doc_id (vec_id_col names the column).
    vecs = spark.createDataFrame(
        [(1, [0.0, 1.0, 0.0]), (4, [1.0, 0.0, 0.0])],
        "doc_id long, embedding array<float>")
    bench_vecs = spark.createDataFrame(
        [(900, [2.0, 0.0, 0.0])], "doc_id long, embedding array<float>")
    out = curation.curate(docs, benchmark_vectors=bench_vecs,
                          corpus_vectors=vecs, vec_id_col="doc_id")
    assert {r.doc_id for r in out.collect()} == {1}
    # both guards compose: the n-gram benchmark kills 1/2/3, the
    # semantic benchmark kills 4 -> empty release
    bench = spark.createDataFrame([(100, GOOD)], "doc_id long, text string")
    both = curation.curate(docs, benchmark=bench, decontam_n=8,
                           benchmark_vectors=bench_vecs,
                           corpus_vectors=vecs, vec_id_col="doc_id")
    assert both.count() == 0


def test_curate_semantic_requires_corpus_vectors(spark):
    import pytest as _pytest
    bench_vecs = spark.createDataFrame(
        [(900, [1.0])], "doc_id long, embedding array<float>")
    with _pytest.raises(ValueError, match="corpus_vectors"):
        curation.curate(_docs(spark), benchmark_vectors=bench_vecs)


def test_curate_prior_release_drops_cross_corpus_dups(spark):
    """reference_docs drops gated docs near-duplicating the PREVIOUS
    release: docs 1 and 2 shingle-identically to the prior doc (J = 1,
    caught in EVERY band — guaranteed, not probabilistic recall) and
    vanish; GOOD2 survives untouched.  Doc 3 (J ~= 0.78 vs prior) is
    banding-probabilistic by design, so it is not asserted either way —
    same recall contract as the within-corpus LSH stage."""
    prior = spark.createDataFrame(
        [(900, GOOD)], "doc_id long, text string")
    got = {r.doc_id for r in
           curation.curate(_docs(spark), reference_docs=prior).collect()}
    assert 4 in got
    assert got & {1, 2} == set()


def test_curate_prior_release_without_overlap_changes_nothing(spark):
    prior = spark.createDataFrame(
        [(900, "entirely unrelated prior corpus body of text")],
        "doc_id long, text string")
    base = {r.doc_id for r in curation.curate(_docs(spark)).collect()}
    with_prior = {r.doc_id for r in
                  curation.curate(_docs(spark),
                                  reference_docs=prior).collect()}
    assert with_prior == base
