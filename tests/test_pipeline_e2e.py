"""End-to-end training-data pipeline composition: the operators are built
to chain — corpus hygiene (boilerplate lines, PII scrub, domain
blocklist) → dedup → decontaminate → quality-gate → deterministic
sample → budget accounting — with each stage a DataFrame in, DataFrame
out, so the whole flow stays one lazy plan until the final action."""

from __future__ import annotations

from pyspark.sql import functions as F

from datafusion_substrait_spark.operators import (contamination, dedup,
                                                  pii, sampling, text)


def test_full_corpus_pipeline(spark, tables):
    raw = tables["documents"]
    n0 = raw.count()

    # 0. corpus hygiene: corpus-level boilerplate lines out, PII redacted,
    # blocklisted domains dropped — each a (doc_id, text)-preserving stage
    cleaned = text.remove_boilerplate_lines(raw, min_docs=3)         .select("doc_id", "text")
    scrubbed = pii.scrub_pii(cleaned)
    docs = pii.filter_blocked_domains(scrubbed, ["blocked.example"])         .join(raw.select("doc_id", "lang"), "doc_id")
    assert docs.count() == n0  # synthetic corpus: nothing blocklisted
    assert docs.columns == ["doc_id", "text", "lang"]

    # 1. exact dedup: keep one doc per normalized-text fingerprint
    survivors = dedup.exact_dedup(docs).select("doc_id")
    deduped = docs.join(survivors, "doc_id")
    n1 = deduped.count()
    assert 0 < n1 <= n0

    # 2. benchmark decontamination (every 97th doc is the eval set; the
    # bench text is the HYGIENIC text — eval sets go through the same
    # preprocessing as the corpus or grams would never align)
    bench = (docs.filter(F.col("doc_id") % 97 == 0)
             .select(F.col("doc_id").alias("bench_id"), "text"))
    clean = contamination.decontaminate(deduped, bench, n=5)
    n2 = clean.count()
    assert 0 < n2 < n1  # at least the benchmark docs themselves drop out

    # 3. quality gate: keep docs above a score floor
    scored = text.quality_features(clean).select("doc_id", "quality_score")
    gated = clean.join(scored.filter(F.col("quality_score") >= 0.3), "doc_id")
    n3 = gated.count()
    assert 0 < n3 <= n2

    # 4. deterministic stratified sample by language
    sampled = sampling.stratified_hash_sample(
        gated, "doc_id", "lang", {"en": 0.5}, default_rate=0.8)
    n4 = sampled.count()
    assert 0 < n4 <= n3
    # re-running yields the identical row set (hash-threshold, no RNG)
    again = sampling.stratified_hash_sample(
        gated, "doc_id", "lang", {"en": 0.5}, default_rate=0.8)
    assert {r.doc_id for r in sampled.select("doc_id").collect()} == \
           {r.doc_id for r in again.select("doc_id").collect()}

    # 5. token budget of the final cut, both counters
    budget = sampled.agg(
        F.sum(text.token_count(F.col("text"))).alias("words"),
        F.sum(text.bpe_token_count(F.col("text"))).alias("bpe")).head()
    assert budget.bpe >= budget.words > 0

    # the composed flow funnels monotonically
    assert n0 >= n1 > n2 >= n3 >= n4 > 0


def test_full_corpus_pipeline_r8_stages(spark, tables):
    """The round-8 operators chained as pipeline stages: markup
    stripping → Gopher rule gate → near-dup clusters → keep-BEST copy
    (not min-key) → deterministic training-order shuffle. Each stage is
    DataFrame-in/DataFrame-out and the final order is reproducible."""
    raw = tables["documents"]
    n0 = raw.count()

    # 0. crawl→text extraction (no-op on this clean corpus, but the
    # schema contract — text replaced, n_tags appended — must hold)
    extracted = text.strip_markup(raw)
    assert extracted.columns == ["doc_id", "text", "n_tags"]
    assert extracted.filter("n_tags > 0").count() == 0
    docs = extracted.select("doc_id", "text")

    # 1. Gopher rule gate
    flags = text.gopher_quality_flags(docs)
    kept = docs.join(flags.filter(~F.col("gopher_flagged"))
                    .select("doc_id"), "doc_id")
    n1 = kept.count()
    assert 0 < n1 <= n0

    # 2. near-dup pairs → clusters → keep the highest-quality copy
    pairs = dedup.minhash_lsh_pairs(kept, threshold=0.35)
    clusters = dedup.dedup_clusters(pairs)
    best = dedup.keep_best_per_cluster(
        clusters, text.quality_features(kept))
    # docs in no cluster survive; clustered docs keep exactly the best
    in_cluster = clusters.select(F.col("node").alias("doc_id"))
    survivors = (kept.join(in_cluster, "doc_id", "left_anti")
                 .select("doc_id")
                 .unionByName(best.filter("kept").select("doc_id")))
    n2 = survivors.count()
    dropped = clusters.count() - best.filter("kept").count()
    assert n2 == n1 - dropped and dropped > 0

    # 3. deterministic training order over the final cut — stable across
    # re-runs and partitionings
    final = kept.join(survivors, "doc_id")
    order1 = [r.doc_id for r in sampling.deterministic_shuffle(
        final, "doc_id").select("doc_id").collect()]
    order2 = [r.doc_id for r in sampling.deterministic_shuffle(
        final.repartition(11), "doc_id").select("doc_id").collect()]
    assert order1 == order2 and len(order1) == n2


def test_cross_modal_unified_dedup(spark):
    """Pairs from THREE modalities over one key space union into a
    single connected-components pass — the unified duplicate-group
    shape a multimodal corpus needs (a doc can be a text near-dup of
    one neighbor and carry the image of another; the cluster must merge
    both). All three pair families share hamming/banding machinery and
    the (a, b) contract, so the union is a plain unionByName."""
    import math
    import struct

    import numpy as np
    from pyspark.sql import functions as F

    from datafusion_substrait_spark.operators import multimodal
    from datafusion_substrait_spark.operators import audio as audio_ops
    from tests.test_operators import _encode_png

    rng = np.random.default_rng(23)
    img = rng.integers(0, 256, (32, 32), np.uint8)
    img2 = np.clip(img.astype(int) + rng.integers(-2, 3, img.shape),
                   0, 255).astype(np.uint8)
    scan = (list(range(5)) * 7)[:32]

    def wav(gain):
        t = [int(gain * 30000 * math.sin(2 * math.pi * 440 * i / 16000))
             for i in range(4096)]
        body = struct.pack(f"<{len(t)}h", *t)
        return (b"RIFF" + struct.pack("<I", 36 + len(body)) + b"WAVEfmt "
                + struct.pack("<IHHIIHH", 16, 1, 1, 16000, 32000, 2, 16)
                + b"data" + struct.pack("<I", len(body)) + body)

    # docs 1-2: text clones; docs 2-3: same image; docs 3-4: same audio
    # → one transitive cluster {1,2,3,4}; doc 5 unrelated everywhere
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again and again",
         None, None),
        (2, "the quick brown fox jumps over the lazy dog again and again!",
         bytes(_encode_png(img.tolist(), 0, scan)), None),
        (3, "completely different text about spark physical planning",
         bytes(_encode_png(img2.tolist(), 0, scan)), wav(0.9)),
        (4, "yet another unrelated body of text entirely here",
         None, wav(0.4)),
        (5, "nothing like any of the others in any modality at all",
         None, None),
    ]
    df = spark.createDataFrame(
        rows, "doc_id bigint, text string, image binary, sound binary")

    tp = dedup.minhash_lsh_pairs(df.select("doc_id", "text"),
                                 threshold=0.5).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
    ip = multimodal.image_neardup_pairs(
        df.filter(F.col("image").isNotNull()), max_hamming=6,
        payload_col="image", key_col="doc_id").select(
        F.col("key_a").alias("a"), F.col("key_b").alias("b"))
    ap = audio_ops.audio_neardup_pairs(
        df.filter(F.col("sound").isNotNull()), max_hamming=6,
        payload_col="sound", key_col="doc_id").select(
        F.col("key_a").alias("a"), F.col("key_b").alias("b"))
    unified = tp.unionByName(ip).unionByName(ap)
    clusters = {r.node: r.cluster_id for r in dedup.dedup_clusters(
        unified, key_a="a", key_b="b").collect()}
    assert clusters == {1: 1, 2: 1, 3: 1, 4: 1}  # transitive merge; 5 out


def test_text_only_semantic_dedup_composition(spark):
    """Zero-model semantic dedup end-to-end (r9): hash_embedding feeds
    train_kmeans_centroids + semdedup directly, so the SemDeDup pipeline
    runs on raw TEXT with no embedding model in the container. Planted:
    3 clone families (light edits — byte-exact dedup misses them) plus
    distinct singletons; every family must lose members to the cosine
    prune and every singleton must survive."""
    from datafusion_substrait_spark.operators import similarity

    bases = [
        "solar panels convert sunlight into electricity using "
        "photovoltaic cells arranged across suburban rooftops",
        "the symphony orchestra rehearsed the second movement while "
        "the conductor adjusted tempo markings in the score",
        "fermentation transforms crushed grapes into wine as yeast "
        "consumes sugar and produces alcohol in oak barrels",
    ]
    singles = [
        "quarterly earnings exceeded analyst expectations despite "
        "headwinds in the logistics and shipping segment",
        "the mountain trail switchbacks through alpine meadows before "
        "reaching the exposed granite summit ridge",
    ]
    rows, k = [], 0
    for b in bases:            # 4 light variants per family
        for suffix in ("", " today", " worldwide", " every year"):
            rows.append((k, b + suffix))
            k += 1
    for s in singles:
        rows.append((k, s))
        k += 1
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")

    from datafusion_substrait_spark.operators.text import hash_embedding
    emb = hash_embedding(docs, dim=64).withColumnRenamed("doc_id", "vec_id")
    cents = similarity.train_kmeans_centroids(emb, n_cells=2)
    out = dedup.semdedup(emb, cents, threshold=0.9)
    kept = {r.vec_id for r in out.filter("kept").collect()}
    dropped = {r.vec_id for r in out.filter("NOT kept").collect()}

    fam = [set(range(i * 4, i * 4 + 4)) for i in range(3)]
    for f in fam:               # each clone family collapses
        assert len(f & kept) < 4 and (f & kept), (f, kept)
    assert {12, 13} <= kept     # singletons always survive
    assert dropped and dropped <= set(range(12))


def test_excision_then_pack_pipeline(spark, tables):
    """r10 stage chained end-to-end: ExactSubstr span excision feeds the
    packer — excised documents shrink their token budget, so the packed
    assignment reflects the CLEANED corpus; the stage contract
    (DataFrame-in/out, same key space, budget never grows) holds."""
    from datafusion_substrait_spark.operators import packing

    docs = tables["documents"].select("doc_id", "text")
    before = text.token_count(F.col("text"))
    excised = text.excise_duplicate_spans(docs, k=8)

    # key space preserved exactly; budget shrinks only where grams fired
    assert excised.count() == docs.count()
    joined = (docs.select("doc_id", before.alias("n_before"))
              .join(excised, "doc_id"))
    bad = joined.filter(
        (F.col("n_tokens_kept") + F.col("n_tokens_excised")
         != F.col("n_before"))
        | ((F.col("n_excised_grams") == 0)
           & (F.col("n_tokens_excised") != 0)))
    assert bad.count() == 0
    total_excised = joined.agg(
        F.sum("n_tokens_excised")).collect()[0][0]
    assert total_excised > 0  # the corpus contains clones

    # pack on the post-excision counts (concat-then-chunk: documents may
    # STRADDLE bins, so the invariant is on start offsets, and the bin a
    # doc starts in is exactly its within-shard cumulative position)
    packed = packing.pack_sequences(
        excised.select("doc_id", "text", "n_tokens_kept"),
        max_tokens=512, n_shards=4, token_col="n_tokens_kept")
    bad_offset = packed.filter(
        (F.col("bin_offset") < 0) | (F.col("bin_offset") >= 512)
        | (F.col("bin_id") < 0))
    assert bad_offset.count() == 0
    assert packed.count() == docs.count()
