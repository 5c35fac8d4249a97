"""Tests for corpus ops (textops), similarity search, multimodal plumbing."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _write_docs(spark, tmp_path, texts):
    """Write a minimal documents.parquet a textops query can read."""
    sf_dir = str(tmp_path)
    spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")
    return sf_dir


def test_simhash_band_keys_spread_on_diverse_corpus(spark, tmp_path):
    """The 64-bit/16-bit-band construction must not concentrate DIVERSE
    docs: on a corpus of distinct word sets, no band key may hold >1% of
    docs (the 16-bit predecessor had only 256 keys/band and concentrated
    by construction). Template-y corpora may still share buckets — that is
    similarity recall, not key-space deficiency."""
    import hashlib

    from pyspark.sql import functions as F

    from linkgraph.textops import SIMHASH_BANDS, _doc_simhash_parts

    def words(i):
        return " ".join(
            hashlib.md5(f"{i}:{j}".encode()).hexdigest()[:8] for j in range(30)
        )

    n = 2000
    sf_dir = _write_docs(spark, tmp_path, [words(i) for i in range(n)])
    sig = _doc_simhash_parts(spark, sf_dir)
    for p in range(SIMHASH_BANDS):
        top = sig.groupBy(f"p{p}").count().agg(F.max("count")).first()[0]
        assert top <= n // 100, f"band {p}: hottest bucket {top}/{n}"


def test_jaccard_stop_shingles_drop_boilerplate(spark, tmp_path):
    """Hot-shingle mitigation: a boilerplate sentence shared by every doc
    (doc-frequency > STOP_SHINGLE_MAX_DF) must not pair unrelated docs;
    genuine near-dups must still be found via their kept shingles."""
    from linkgraph.textops import STOP_SHINGLE_MAX_DF, q_doc_jaccard_pairs

    boiler = "subscribe to our newsletter for the latest updates and offers"
    n = STOP_SHINGLE_MAX_DF + 10  # boilerplate shingles exceed the cap
    texts = []
    for i in range(n):
        unique = " ".join(f"w{i}x{j}" for j in range(12))
        texts.append(f"{boiler} {unique}")
    # docs n and n+1: true near-dups (same unique body, one word changed)
    body = " ".join(f"dup{j}" for j in range(12))
    texts.append(f"{boiler} {body}")
    texts.append(f"{boiler} {body} extra")
    sf_dir = _write_docs(spark, tmp_path, texts)

    pairs = q_doc_jaccard_pairs(spark, sf_dir).toPandas()
    got = {(a, b) for a, b in zip(pairs["doc_a"], pairs["doc_b"])}
    assert (n, n + 1) in got, pairs
    # boilerplate alone must not pair unrelated docs
    unrelated = {p for p in got if p != (n, n + 1)}
    assert not unrelated, unrelated


def test_token_count_matches_pandas(spark):
    from linkgraph.textops import q_doc_token_count

    got = q_doc_token_count(spark, SF).toPandas().set_index("doc_id")["tokens"]
    docs = pd.read_parquet(f"{SF}/documents.parquet")

    def count(t):
        t = re.sub(r"\s+", " ", t.lower()).strip()
        return 0 if t == "" else len(t.split(" "))

    want = docs.set_index("doc_id")["text"].map(count)
    assert (got.sort_index() == want.sort_index()).all()


def test_exact_dedup_self_consistent(spark):
    from linkgraph.textops import q_doc_dedup_exact, q_doc_fingerprint

    fps = q_doc_fingerprint(spark, SF).toPandas()
    dups = q_doc_dedup_exact(spark, SF).toPandas()
    by_fp = fps.groupby("fingerprint")["doc_id"].agg(["min", "count"])
    expected_dups = int((by_fp["count"] - 1).sum())
    assert len(dups) == expected_dups
    if len(dups):
        # every reported canonical is the min doc_id of its fingerprint group
        merged = dups.merge(fps, on="doc_id")
        canon = fps.groupby("fingerprint")["doc_id"].min()
        assert (merged["canonical_id"] == merged["fingerprint"].map(canon)).all()


def test_minhash_lsh_superset_sanity(spark):
    """LSH candidates must include every jaccard==1 exact pair (identical
    shingle sets share every band signature)."""
    from linkgraph.textops import q_doc_jaccard_pairs, q_doc_minhash_lsh_candidates

    exact = q_doc_jaccard_pairs(spark, SF).toPandas()
    cands = q_doc_minhash_lsh_candidates(spark, SF).toPandas()
    full = exact[exact["jaccard"] >= 0.9999]
    cand_set = {(a, b) for a, b in zip(cands["doc_a"], cands["doc_b"])}
    for a, b in zip(full["doc_a"], full["doc_b"]):
        assert (a, b) in cand_set


def test_knn_bruteforce_matches_numpy(spark):
    from linkgraph.simsearch import N_QUERIES, TOP_K, q_knn_bruteforce

    got = q_knn_bruteforce(spark, SF).toPandas()
    emb = pd.read_parquet(f"{SF}/embeddings.parquet")
    # float64 like the engine (Spark casts each element to double)
    M = np.stack(emb["embedding"].map(np.asarray)).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    sims = Mn @ Mn.T
    for q in range(N_QUERIES):
        qi = np.where(ids == q)[0][0]
        s = np.round(sims[qi], 3)
        order = sorted(
            [(float(-s[j]), int(ids[j])) for j in range(len(ids)) if ids[j] != q]
        )[:TOP_K]
        want = [(v, -neg) for neg, v in order]
        sub = got[got["query_id"] == q].sort_values("rn")
        got_pairs = list(zip(sub["neighbor_id"], sub["cosine"]))
        assert got_pairs == [(v, pytest.approx(c, abs=1e-9)) for v, c in want]


def test_knn_lsh_returns_plausible_neighbors(spark):
    from linkgraph.simsearch import N_QUERIES, q_knn_lsh

    got = q_knn_lsh(spark, SF).toPandas()
    assert set(got["query_id"].unique()) <= set(range(N_QUERIES))
    assert (got["cosine"] <= 1.001).all() and len(got) > 0


def test_knn_ivf_recall_floor(spark):
    """IVF probing must recover most of the exact top-k (recall@k >= 0.6 on
    the fixture embeddings — label-clustered, so probing IVF_NPROBE of 16
    k-means-refined cells covers the true neighbors of most queries)."""
    from linkgraph.simsearch import N_QUERIES, TOP_K, q_knn_bruteforce, q_knn_ivf

    exact = q_knn_bruteforce(spark, SF).toPandas()
    approx = q_knn_ivf(spark, SF).toPandas()
    hits = total = 0
    for q in range(N_QUERIES):
        want = set(exact[exact["query_id"] == q]["neighbor_id"])
        got = set(approx[approx["query_id"] == q]["neighbor_id"])
        hits += len(want & got)
        total += len(want)
    assert total == N_QUERIES * TOP_K
    assert hits / total >= 0.6, f"recall@{TOP_K} = {hits / total:.2f}"


def test_multimodal_feature_plumbing(spark):
    from linkgraph.multimodal import (
        FEATURE_DIM,
        decode_image_batch,
        extract_media_features,
        fake_feature_extractor,
    )
    from linkgraph.synth import gen_pages

    pages = gen_pages(spark, 50)
    out = extract_media_features(pages, key_col="url", payload_col="html").toPandas()
    assert len(out) >= 50
    assert all(len(f) == FEATURE_DIM for f in out["features"])
    # deterministic: same payload -> same features, matches local extractor
    row = pages.limit(1).toPandas().iloc[0]
    local = fake_feature_extractor(row["html"])
    spark_feats = out[out["key"] == row["url"]]["features"].iloc[0]
    assert np.allclose(np.array(spark_feats, dtype=np.float32), local)
    with pytest.raises(NotImplementedError):
        decode_image_batch(pd.Series([b"x"]))


def test_multimodal_requantization_is_exact():
    """The multimodal_features oracle contract (no Spark needed): every
    float32 feature u/65535 must round-trip to its uint16 u EXACTLY via
    round(f * 65535) — the property that lets DuckDB compare integers
    instead of float32 renderings. Proven for the whole lattice, not a
    sample: all 65536 possible feature values."""
    u = np.arange(65536, dtype=np.uint16)
    f = (u.astype(np.float32) / 65535.0).astype(np.float32)  # extractor math
    back = np.rint(f.astype(np.float64) * 65535.0).astype(np.int64)  # Spark math
    assert (back == u).all()


def test_multimodal_extractor_byte_order_is_little_endian():
    """The DuckDB oracle recomputes each u from sha256 hex pairs assuming
    little-endian byte order; pin the extractor to the same interpretation
    explicitly (a native-dtype frombuffer would silently flip every value
    on a big-endian host)."""
    import hashlib

    from linkgraph.multimodal import FEATURE_DIM, fake_feature_extractor

    payload = b"endianness-pin"
    digest = hashlib.sha256(payload).digest()
    want = np.array(
        [
            (digest[2 * i] | (digest[2 * i + 1] << 8)) / 65535.0
            for i in range(FEATURE_DIM)
        ],
        dtype=np.float32,
    )
    got = fake_feature_extractor(payload)
    assert got.dtype == np.float32 and (got == want).all()


def test_lang_id_mostly_right_on_en(spark):
    """Sanity: heuristic lang-id is deterministic and scores real English
    docs as 'en' more often than any other label."""
    from linkgraph.textops import q_doc_lang_id

    got = q_doc_lang_id(spark, SF).toPandas()
    en = got[got["actual_lang"] == "en"]
    if len(en):
        acc = (en["predicted_lang"] == "en").mean()
        top = got["predicted_lang"].value_counts()
        assert acc >= 0.5 or top.index[0] == "en"


def test_embedding_near_dup_scale_guard(spark):
    """Past EMB_EXACT_MAX_ROWS the near-dup operator must NOT plan the
    all-pairs cross join: forcing the bound to 0 routes through banded
    SimHash LSH + exact rescore. Precision stays exact (bucketed ⊆ exact
    with identical cosines) and identical vectors — the pairs dedup
    actually hunts — always collide on every band, so they are never lost."""
    from linkgraph.simsearch import embedding_near_dup_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    exact = embedding_near_dup_pairs(emb)  # small corpus -> exact path
    bucketed = embedding_near_dup_pairs(emb, max_exact_rows=0)

    plan = bucketed._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    e = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in exact.collect()}
    b = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in bucketed.collect()}
    assert set(b) <= set(e), "bucketed path produced a pair the exact path lacks"
    assert all(e[k] == b[k] for k in b), "in-bucket rescore must be exact"
    # cosine == 1.0 pairs (identical direction) agree on every hyperplane
    # sign, hence share all bands — guaranteed recall for true duplicates
    dup_pairs = {k for k, v in e.items() if v >= 0.999}
    assert dup_pairs <= set(b)


def test_embedding_near_dup_n_rows_hint_routes_without_count(spark):
    """The caller-supplied ``n_rows`` hint decides the exact-vs-LSH regime
    INSTEAD of the gating count scan: a hint above the bound routes this
    tiny corpus through LSH (no cross join in the plan), a hint below
    keeps the exact path — i.e. the hint, not a count of the actual data,
    is what the gate consumed."""
    from linkgraph.simsearch import embedding_near_dup_pairs

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    hinted_large = embedding_near_dup_pairs(emb, n_rows=10**9)
    plan = hinted_large._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan

    hinted_small = embedding_near_dup_pairs(emb, n_rows=10)
    plan_small = hinted_small._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" in plan_small or "BroadcastNestedLoopJoin" in plan_small

    # and the hinted-exact result is identical to the unhinted one
    e = {(r["vec_a"], r["vec_b"]): r["cosine"]
         for r in embedding_near_dup_pairs(emb).collect()}
    h = {(r["vec_a"], r["vec_b"]): r["cosine"] for r in hinted_small.collect()}
    assert e == h


def test_scrub_text_and_pii_counts(spark):
    """scrub_text redacts exactly what the PII-density metrics count: after
    scrubbing, the same count expressions find zero emails/urls, and
    non-PII text passes through untouched."""
    from pyspark.sql import functions as F

    from linkgraph.textops import PII_EMAIL_RE, PII_URL_RE, scrub_text

    rows = [
        ("contact bob@example.com or visit https://example.com/a?b=1 now",),
        ("two mails: a.b+c@x-y.org and d@e.io plus http://t.co/x",),
        ("no pii here, just words",),
        ("",),
        # mixed/upper case: the scrub runs on ORIGINAL text (you redact
        # what you keep), so the patterns must be case-insensitive
        ("Mail Bob@EXAMPLE.COM or see HTTPS://X.CO/Secret",),
    ]
    df = spark.createDataFrame(rows, "text string")
    out = df.select(
        scrub_text(F.col("text")).alias("clean"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(PII_EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(F.lower("text"), F.lit(PII_URL_RE), F.lit(0))).alias("n_urls"),
    ).collect()
    assert [r["n_emails"] for r in out] == [1, 2, 0, 0, 1]
    assert [r["n_urls"] for r in out] == [1, 1, 0, 0, 1]
    leftover = df.sparkSession.createDataFrame(
        [(r["clean"],) for r in out], "text string"
    ).select(
        F.sum(F.size(F.regexp_extract_all("text", F.lit(PII_EMAIL_RE), F.lit(0)))).alias("e"),
        F.sum(F.size(F.regexp_extract_all("text", F.lit(PII_URL_RE), F.lit(0)))).alias("u"),
    ).first()
    assert leftover["e"] == 0 and leftover["u"] == 0, [r["clean"] for r in out]
    assert out[2]["clean"] == "no pii here, just words"
    assert "<EMAIL>" in out[0]["clean"] and "<URL>" in out[0]["clean"]


def test_multimodal_resize_and_frame_sampling_plumbing(spark):
    """C14 resize + frame-sample surfaces: Arrow batch shapes, parameter
    closures, one-to-many fan-out, determinism, and layout independence
    (repartitioning must not change the sampled rows)."""
    from linkgraph.multimodal import (
        FRAME_BYTES,
        fake_frame_iter,
        fake_resize,
        resize_media,
        sample_video_frames,
    )
    from linkgraph.synth import gen_pages

    # one row per url: the generator emits re-crawl duplicates by design
    pages = gen_pages(spark, 40).dropDuplicates(["url"])
    n = pages.count()

    resized = resize_media(pages, key_col="url", payload_col="html", width=64, height=32)
    rows = resized.collect()
    assert len(rows) == n
    assert all(r["width"] == 64 and r["height"] == 32 for r in rows)
    assert all(bytes(r["payload"]).startswith(b"RSZv1|64|32|") for r in rows)
    # deterministic: same payload -> same resized bytes
    one = pages.limit(1).collect()[0]
    assert bytes(
        resize_media(pages.limit(1), "url", "html", 64, 32).first()["payload"]
    ) == fake_resize(bytes(one["html"]), 64, 32)

    frames = sample_video_frames(pages, key_col="url", payload_col="html", every_n=2)
    got = frames.collect()
    # every input produced >= 1 frame, with the expected stride and count
    by_key = {}
    for r in got:
        by_key.setdefault(r["key"], []).append((r["frame_no"], r["ts_ms"], bytes(r["frame"])))
    assert len(by_key) == n
    for r0 in pages.select("url", "html").collect():
        want = list(fake_frame_iter(bytes(r0["html"]), 2))
        have = sorted(by_key[r0["url"]])
        assert [(n, t) for n, t, _ in want] == [(n, t) for n, t, _ in have]
        assert all(len(f) <= FRAME_BYTES for _, _, f in have)
    # layout independence: a different partitioning samples identical rows
    reparted = sample_video_frames(
        pages.repartition(7), key_col="url", payload_col="html", every_n=2
    )
    a = sorted((r["key"], r["frame_no"], bytes(r["frame"])) for r in got)
    b = sorted((r["key"], r["frame_no"], bytes(r["frame"])) for r in reparted.collect())
    assert a == b


def test_similarity_queries_survive_zero_norm_embedding(spark, tmp_path):
    """Spark 4 runs ANSI mode by default, where double/0.0 RAISES: one
    all-zeros embedding (failed encode / null padding) must degrade to a
    NULL cosine that threshold filters and top-k windows drop — never
    kill the query — and must not perturb the well-defined rows."""
    import os

    from linkgraph.simsearch import (
        embedding_near_dup_pairs,
        q_knn_bruteforce,
        q_knn_lsh,
    )

    rows = [(i, [float((i + j) % 5) - 2.0 for j in range(8)], "a") for i in range(12)]
    rows.append((99, [0.0] * 8, "a"))  # the degenerate vector
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>, label string")
    sf = str(tmp_path)
    emb.write.mode("overwrite").parquet(os.path.join(sf, "embeddings.parquet"))

    knn = q_knn_bruteforce(spark, sf).toPandas()  # would raise DIVIDE_BY_ZERO unguarded
    assert len(knn) > 0
    assert 99 not in set(knn["neighbor_id"])  # NULL cosine sorts after real scores

    lsh = q_knn_lsh(spark, sf).toPandas()
    assert 99 not in set(lsh["neighbor_id"])

    for path_rows in (None, 10**9):  # exact path AND banded-LSH path
        dups = embedding_near_dup_pairs(emb, n_rows=path_rows).toPandas()
        assert len(dups) > 0
        assert 99 not in set(dups["vec_a"]) | set(dups["vec_b"])
        assert dups["cosine"].notna().all()

    # the DuckDB ORACLE must survive the same degenerate vector: NULLIF
    # normalization used to make u an all-NULL list and list_dot_product
    # raises on NULL elements — the oracle died on exactly the input the
    # Spark side is hardened for, failing the driver gate
    import duckdb

    from linkgraph.simsearch import EMB_NEAR_DUP_SQL

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet/*.parquet')"
    )
    want = con.execute(EMB_NEAR_DUP_SQL).df()
    exact = embedding_near_dup_pairs(emb).toPandas()
    assert len(want) == len(exact) > 0
    assert 99 not in set(want["vec_a"]) | set(want["vec_b"])


def test_per_operator_oracle_sql_twins_match_spark(spark, tmp_path):
    """The five per-operator SQL twins (fingerprint, token count, quality,
    lang-id, rolling fingerprint) are documentation-grade oracles that the
    driver gate does NOT run (it consumes the merged one-scan constants) —
    without a gate of their own they silently drift from their Spark
    counterparts. Cross-check each against its q_* function on real
    testdata with the same row/column/value-hash discipline as
    tools/check_oracles.py. The corpus is augmented with degenerate docs
    (empty text, one word, vertical tab) so the shared normalization is
    exercised where the engines' regex classes historically diverged."""
    import duckdb

    from linkgraph.textops import (
        DOC_FINGERPRINT_SQL,
        DOC_LANG_ID_SQL,
        DOC_QUALITY_SQL,
        DOC_ROLLING_FP_SQL,
        DOC_TOKEN_COUNT_SQL,
        q_doc_fingerprint,
        q_doc_lang_id,
        q_doc_quality,
        q_doc_rolling_fingerprint,
        q_doc_token_count,
    )

    sf_dir = str(tmp_path)
    base = spark.read.parquet(f"{SF}/documents.parquet").limit(200)
    extra = spark.createDataFrame(
        [
            (90001, "", "en", "synthetic", 0),
            (90002, "word", "en", "synthetic", 4),
            (90003, "a\x0bb cde  fgh\tij", "en", "synthetic", 16),
            (90004, "The THE the and AND http://x.example/a http://y.example/b", "en", "synthetic", 57),
        ],
        "doc_id long, text string, lang string, source string, n_chars int",
    )
    # align schemas: keep only the columns both sides share
    common = [c for c in base.columns if c in extra.columns]
    docs = base.select(common).unionByName(extra.select(common))
    docs.write.mode("overwrite").parquet(f"{sf_dir}/documents.parquet")

    con = duckdb.connect()
    con.execute(
        # Spark writes a DIRECTORY of part files; glob them for DuckDB
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet/*.parquet')"
    )

    import sys

    sys.path.insert(0, "/root/repo/tools")
    from check_oracles import value_hash

    pairs = [
        ("fingerprint", q_doc_fingerprint, DOC_FINGERPRINT_SQL),
        ("token_count", q_doc_token_count, DOC_TOKEN_COUNT_SQL),
        ("quality", q_doc_quality, DOC_QUALITY_SQL),
        ("lang_id", q_doc_lang_id, DOC_LANG_ID_SQL),
        ("rolling_fp", q_doc_rolling_fingerprint, DOC_ROLLING_FP_SQL),
    ]
    for name, fn, sql in pairs:
        got = fn(spark, sf_dir).toPandas()
        want = con.execute(sql).df()
        assert len(got) == len(want), (name, len(got), len(want))
        assert sorted(got.columns) == sorted(want.columns), name
        assert value_hash(got) == value_hash(want), f"{name}: value hash mismatch"
