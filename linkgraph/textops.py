"""Training-data text operators over the ``documents`` table.

Large-scale corpus-pipeline primitives, each expressed Spark-first (built-in
column functions; no per-row Python) with a DuckDB-equivalent oracle:

- exact deduplication (hash-groupBy)
- n-gram/shingle Jaccard near-dup pairs (shingle join — the exact baseline
  the MinHash path approximates)
- MinHash + LSH banding near-dup candidates (portable md5-based min-hash so
  Spark and DuckDB compute identical signatures)
- document fingerprinting (md5 of normalized text)
- token counting, quality scoring (length/punct/word stats)
- language identification via stopword-hit scoring (regex counts, argmax
  with deterministic tie-break)

Scale notes: the shingle self-join is quadratic only within shingle-buckets
(hot shingles are the skew risk — at crawl scale drop top-frequency shingles
like stop-shingles); MinHash/LSH replaces the exact join with banded
bucketing, which is the 10^12-doc path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

JACCARD_THRESHOLD = 0.5
SHINGLE_WORDS = 3
MINHASH_K = 8  # number of hash functions
LSH_BANDS = 4  # rows per band = MINHASH_K / LSH_BANDS = 2
# stop-shingle cap for the EXACT Jaccard path: shingles appearing in more
# than this many docs (boilerplate headers/footers on real crawl text) are
# dropped before the self-join on BOTH engines — the bucket join is
# quadratic per shingle, so one boilerplate shingle shared by k docs costs
# k^2/2 pairs. The convention (pinned here) is that jaccard is computed
# over the KEPT shingle sets.
STOP_SHINGLE_MAX_DF = 50


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _norm_text(col):
    """lower + collapse whitespace + trim — shared normalization.

    The whitespace class is spelled out EXPLICITLY because the engines
    disagree on shorthand: Java regex ``\\s`` includes vertical tab
    \\x0B, DuckDB's RE2 ``\\s`` does not — a doc containing \\x0B would
    normalize differently on the two sides and flip the value hash of
    every downstream fingerprint/shingle/token query. One class, both
    engines, byte-identical output."""
    return F.trim(F.regexp_replace(F.lower(col), "[ \\t\\n\\x0B\\f\\r]+", " "))


_NORM_SQL = r"trim(regexp_replace(lower(text), '[ \t\n\x0b\f\r]+', ' ', 'g'))"


# ------------------------------------------------------------- fingerprints

def q_doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id", F.md5(_norm_text(F.col("text"))).alias("fingerprint")
    )


DOC_FINGERPRINT_SQL = f"""
SELECT doc_id, md5({_NORM_SQL}) AS fingerprint FROM documents
"""


def q_doc_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: canonical doc (min doc_id) per identical normalized text;
    rows = every non-canonical duplicate, with its canonical id."""
    d = _docs(spark, sf_dir).select(
        "doc_id", F.md5(_norm_text(F.col("text"))).alias("fp")
    )
    canon = d.groupBy("fp").agg(F.min("doc_id").alias("canonical_id"))
    return (
        d.join(canon, "fp")
        .filter(F.col("doc_id") != F.col("canonical_id"))
        .select("doc_id", "canonical_id")
    )


DOC_DEDUP_EXACT_SQL = f"""
WITH fps AS (SELECT doc_id, md5({_NORM_SQL}) AS fp FROM documents),
canon AS (SELECT fp, MIN(doc_id) AS canonical_id FROM fps GROUP BY fp)
SELECT f.doc_id, c.canonical_id
FROM fps f JOIN canon c ON f.fp = c.fp
WHERE f.doc_id <> c.canonical_id
"""


# ------------------------------------------------------- shingles / jaccard

def _shingles(d: DataFrame) -> DataFrame:
    """Distinct word-``SHINGLE_WORDS``-gram shingles per doc (md5-hashed)."""
    words = d.select(
        "doc_id", F.split(_norm_text(F.col("text")), " ").alias("w")
    )
    n = SHINGLE_WORDS
    # docs shorter than n words produce NO shingles (the oracle's
    # WHERE len(words) >= n twin). Without the guard, sequence(0, size-n)
    # goes DESCENDING for short docs and slice(w, 0, n) raises
    # INVALID_PARAMETER_VALUE.START — one empty/two-word doc in the
    # corpus would abort every shingle-based query.
    #
    # Dedup is per-row `array_distinct` BEFORE the explode, not a
    # DataFrame .distinct() after it: doc_id is unique per input row, so
    # the (doc_id, sh) distinct is exactly a within-document distinct —
    # an array op, costing zero exchange where the old spelling shuffled
    # every (doc_id, shingle) occurrence. Same distinct pairs out.
    grams = F.when(
        F.size("w") >= n,
        F.transform(
            F.sequence(F.lit(0), F.size("w") - F.lit(n)),
            lambda i: F.md5(F.array_join(F.slice("w", i + 1, n), " ")),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return words.select(
        "doc_id", F.explode(F.array_distinct(grams)).alias("sh")
    )


_SHINGLES_SQL = f"""
shingles AS (
    SELECT DISTINCT doc_id,
           md5(array_to_string(words[i + 1 : i + {SHINGLE_WORDS}], ' ')) AS sh
    FROM (SELECT doc_id, string_split({_NORM_SQL}, ' ') AS words FROM documents),
         UNNEST(range(len(words) - {SHINGLE_WORDS} + 1)) AS t(i)
    WHERE len(words) >= {SHINGLE_WORDS}
)"""


def q_doc_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-Jaccard near-dup pairs (>= threshold), a < b, computed
    over the kept shingle sets after dropping stop-shingles with
    doc-frequency > STOP_SHINGLE_MAX_DF (hot-bucket mitigation; identical
    cap in the DuckDB oracle)."""
    raw = _shingles(_docs(spark, sf_dir))
    df_counts = raw.groupBy("sh").agg(F.count(F.lit(1)).alias("df"))
    # lazy localCheckpoint, NOT persist: the kept-shingle set feeds three
    # consumers (sizes + both self-join sides) so it must materialize
    # once, but a persist() inside a returned-lazy plan pins a
    # CacheManager entry for the session's lifetime (nobody can
    # unpersist it after return). A lazy localCheckpoint computes once on
    # first use and its blocks are ContextCleaner-reclaimed when the
    # caller drops the plan.
    sh = raw.join(
        df_counts.filter(F.col("df") > STOP_SHINGLE_MAX_DF), "sh", "left_anti"
    ).localCheckpoint(eager=False)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    a = sh.withColumnRenamed("doc_id", "doc_a")
    b = sh.withColumnRenamed("doc_id", "doc_b")
    inter = (
        a.join(b, "sh")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    out = (
        inter.join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "na"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "nb"), "doc_b")
        .withColumn("jaccard", F.round(F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")), 4))
        .filter(F.col("jaccard") >= JACCARD_THRESHOLD)
        .select("doc_a", "doc_b", "jaccard")
    )
    return out


DOC_JACCARD_SQL = f"""
WITH {_SHINGLES_SQL.strip()},
kept AS MATERIALIZED (
    SELECT s.doc_id, s.sh
    FROM shingles s
    JOIN (SELECT sh FROM shingles GROUP BY sh
          HAVING COUNT(*) <= {STOP_SHINGLE_MAX_DF}) k ON k.sh = s.sh
),
sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY doc_id),
inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS inter
    FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
)
SELECT i.doc_a, i.doc_b,
       ROUND(i.inter / (sa.n_sh + sb.n_sh - i.inter), 4) AS jaccard
FROM inter i
JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE ROUND(i.inter / (sa.n_sh + sb.n_sh - i.inter), 4) >= {JACCARD_THRESHOLD}
"""


# ----------------------------------------------------------- minhash / LSH

def q_doc_minhash_lsh_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup candidate pairs.

    Portable signature: minhash_k(doc) = MIN(md5(k || ':' || shingle)) — the
    lexicographic min of a keyed md5 is a valid min-hash permutation and is
    computable identically in DuckDB. Docs sharing any LSH band (concat of
    MINHASH_K/LSH_BANDS consecutive signature slots) become candidates.
    """
    sh = _shingles(_docs(spark, sf_dir))
    sig = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.lit(f"{k}:"), F.col("sh")))).alias(f"mh{k}")
            for k in range(MINHASH_K)
        ]
    )
    rows_per_band = MINHASH_K // LSH_BANDS
    bands = None
    for b in range(LSH_BANDS):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        one = sig.select(
            "doc_id", F.lit(b).alias("band"), F.md5(F.concat_ws("|", *cols)).alias("sig")
        )
        bands = one if bands is None else bands.unionByName(one)
    a = bands.withColumnRenamed("doc_id", "doc_a")
    b2 = bands.withColumnRenamed("doc_id", "doc_b")
    return (
        a.join(b2, ["band", "sig"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def _minhash_sql() -> str:
    mh_cols = ",\n           ".join(
        f"MIN(md5('{k}:' || sh)) AS mh{k}" for k in range(MINHASH_K)
    )
    rows_per_band = MINHASH_K // LSH_BANDS
    band_selects = []
    for b in range(LSH_BANDS):
        cols = " || '|' || ".join(
            f"mh{b * rows_per_band + r}" for r in range(rows_per_band)
        )
        band_selects.append(
            f"SELECT doc_id, {b} AS band, md5({cols}) AS sig FROM sig"
        )
    bands = " UNION ALL ".join(band_selects)
    return f"""
WITH {_SHINGLES_SQL.strip()},
sig AS (
    SELECT doc_id,
           {mh_cols}
    FROM shingles GROUP BY doc_id
),
bands AS ({bands})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
"""


DOC_MINHASH_LSH_SQL = _minhash_sql()


# ------------------------------------------------------------------ simhash

SIMHASH_DOC_BITS = 64  # 4 LSH bands x 16 bits
SIMHASH_BANDS = 4
SIMHASH_BAND_BITS = SIMHASH_DOC_BITS // SIMHASH_BANDS  # 16 -> 65536 keys/band
SIMHASH_HAMMING_MAX = 3
_ODD_HEX = ("1", "3", "5", "7", "9", "b", "d", "f")


def _doc_simhash_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, p0..p3) — word-level 64-bit SimHash as four 16-bit parts,
    portable across engines.

    Bit j of the signature = sign (>= 0) of the sum over the doc's distinct
    words of ±1. The ±1 stream comes from hex-digit parity of TWO keyed
    md5s per word (md5(w) covers bits 0-31, md5('#' || w) bits 32-63); md5
    is available verbatim in both Spark and DuckDB, so the oracle computes
    byte-identical signatures (convention pinned here). Parts (not one
    BIGINT) because bit 63 of a packed signature overflows signed 64-bit
    arithmetic in both engines; band keys and Hamming distance only ever
    need the parts.

    16-bit signatures banded at 8 bits gave 256 buckets/band — bucket
    joins go quadratic in N/256 at crawl scale. 64/16 gives 65,536 keys
    per band and a far lower false-candidate rate.
    """
    d = _docs(spark, sf_dir)
    # within-document word dedup as a per-row array_distinct (doc_id is
    # unique per input row, so this IS the (doc_id, w) distinct) — the
    # old explode-then-.distinct() shuffled every word occurrence; now
    # the only exchange left is the groupBy(doc_id), whose map-side
    # partial agg collapses each doc to one 64-column row first.
    words = (
        d.select(
            "doc_id",
            F.explode(
                F.array_distinct(F.split(_norm_text(F.col("text")), " "))
            ).alias("w"),
        )
        .filter(F.col("w") != "")
        .withColumn("h1", F.md5("w"))
        .withColumn("h2", F.md5(F.concat(F.lit("#"), F.col("w"))))
    )

    def digit(j: int):
        col, pos = ("h1", j) if j < 32 else ("h2", j - 32)
        return F.substring(col, pos + 1, 1)

    sums = words.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(digit(j).isin(*_ODD_HEX), F.lit(1)).otherwise(F.lit(-1))
            ).alias(f"s{j}")
            for j in range(SIMHASH_DOC_BITS)
        ]
    )
    parts = []
    for p in range(SIMHASH_BANDS):
        part = F.lit(0)
        for b in range(SIMHASH_BAND_BITS):
            j = p * SIMHASH_BAND_BITS + b
            part = part + F.when(F.col(f"s{j}") >= 0, F.lit(1 << b)).otherwise(F.lit(0))
        parts.append(part.cast("long").alias(f"p{p}"))
    return sums.select("doc_id", *parts)


def _hex16(col):
    """Fixed-width lowercase 4-hex-digit rendering of a 16-bit part —
    identical in Spark (hex) and DuckDB (to_hex)."""
    return F.lpad(F.lower(F.hex(col)), 4, "0")


def q_doc_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash): the 64-bit signature as a 16-hex-char string
    (p3 high to p0 low)."""
    parts = _doc_simhash_parts(spark, sf_dir)
    return parts.select(
        "doc_id",
        F.concat(
            _hex16(F.col("p3")), _hex16(F.col("p2")),
            _hex16(F.col("p1")), _hex16(F.col("p0")),
        ).alias("simhash"),
    )


def _simhash_sql_core() -> str:
    odd = ", ".join(f"'{c}'" for c in _ODD_HEX)

    def digit(j: int) -> str:
        col, pos = ("h1", j) if j < 32 else ("h2", j - 32)
        return f"substr({col}, {pos + 1}, 1)"

    s_cols = ",\n           ".join(
        f"SUM(CASE WHEN {digit(j)} IN ({odd}) THEN 1 ELSE -1 END) AS s{j}"
        for j in range(SIMHASH_DOC_BITS)
    )
    part_exprs = []
    for p in range(SIMHASH_BANDS):
        bits = " + ".join(
            f"(CASE WHEN s{p * SIMHASH_BAND_BITS + b} >= 0 THEN {1 << b} ELSE 0 END)"
            for b in range(SIMHASH_BAND_BITS)
        )
        part_exprs.append(f"CAST({bits} AS BIGINT) AS p{p}")
    parts = ",\n           ".join(part_exprs)
    return f"""
words AS (
    SELECT DISTINCT doc_id, md5(w) AS h1, md5('#' || w) AS h2
    FROM (SELECT doc_id, UNNEST(string_split({_NORM_SQL}, ' ')) AS w FROM documents)
    WHERE w <> ''
),
sums AS (
    SELECT doc_id,
           {s_cols}
    FROM words GROUP BY doc_id
),
sig AS (
    SELECT doc_id,
           {parts}
    FROM sums
)"""


def _hex16_sql(col: str) -> str:
    return f"lpad(lower(to_hex({col})), 4, '0')"


DOC_SIMHASH_SQL = f"""
WITH {_simhash_sql_core().strip()}
SELECT doc_id,
       {_hex16_sql('p3')} || {_hex16_sql('p2')} || {_hex16_sql('p1')} || {_hex16_sql('p0')} AS simhash
FROM sig
"""


def q_doc_simhash_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: LSH banding (SIMHASH_BANDS bands of
    SIMHASH_BAND_BITS bits — band b's key is part pb) proposes candidates,
    exact Hamming distance <= SIMHASH_HAMMING_MAX confirms. The band step
    is what makes this linear-ish at crawl scale — only docs agreeing on a
    full 16-bit quarter of the signature are ever paired."""
    sig = _doc_simhash_parts(spark, sf_dir)
    part_cols = [f"p{p}" for p in range(SIMHASH_BANDS)]
    bands = None
    for p in range(SIMHASH_BANDS):
        one = sig.select(
            "doc_id", *part_cols, F.lit(p).alias("band"), F.col(f"p{p}").alias("key")
        )
        bands = one if bands is None else bands.unionByName(one)
    a = bands.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(c).alias(f"a_{c}") for c in part_cols],
        "band",
        "key",
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(c).alias(f"b_{c}") for c in part_cols],
        "band",
        "key",
    )
    hamming = None
    for c in part_cols:
        h = F.bit_count(F.col(f"a_{c}").bitwiseXOR(F.col(f"b_{c}")))
        hamming = h if hamming is None else hamming + h
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", *[f"a_{c}" for c in part_cols], *[f"b_{c}" for c in part_cols])
        .distinct()
        .withColumn("hamming", hamming.cast("long"))
        .filter(F.col("hamming") <= SIMHASH_HAMMING_MAX)
        .select("doc_a", "doc_b", "hamming")
    )


def _simhash_near_dups_sql() -> str:
    band_selects = " UNION ALL ".join(
        f"SELECT doc_id, p0, p1, p2, p3, {p} AS band, p{p} AS key FROM sig"
        for p in range(SIMHASH_BANDS)
    )
    ham = " + ".join(f"bit_count(xor(a.p{p}, b.p{p}))" for p in range(SIMHASH_BANDS))
    return f"""
WITH {_simhash_sql_core().strip()},
bands AS ({band_selects})
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST({ham} AS BIGINT) AS hamming
FROM bands a
JOIN bands b ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
WHERE {ham} <= {SIMHASH_HAMMING_MAX}
"""


DOC_SIMHASH_NEAR_DUPS_SQL = _simhash_near_dups_sql()


# ------------------------------------------------------------ text analysis

# PII patterns, restricted to syntax Java regex (Spark) and RE2 (DuckDB)
# both accept (no lookaround): the standard pretraining scrub targets.
# (?i) inline flag: case-insensitive in BOTH Java regex and RE2 — the
# scrub runs on the ORIGINAL text (you redact what you keep), which is
# not lowercased like the metrics input
PII_EMAIL_RE = r"(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
# explicit whitespace class, not [^\s]: Java's \s includes \x0B, RE2's
# does not — the shorthand would count URLs differently on the two
# engines for text containing a vertical tab (see _norm_text)
PII_URL_RE = r"(?i)https?://[^ \t\n\x0b\f\r]+"


def scrub_text(col):
    """Redact emails then URLs (training-data scrub): replaced with typed
    placeholder tokens so downstream token statistics stay stable. Pure
    column expressions — JVM-side, linear scan."""
    return F.regexp_replace(
        F.regexp_replace(col, PII_EMAIL_RE, "<EMAIL>"), PII_URL_RE, "<URL>"
    )


# GPT-2-style pre-tokenizer approximation, restricted to syntax both Java
# regex (Spark) and RE2 (DuckDB) accept: no lookahead, explicit classes.
# Runs of letters / digits / other-symbols (each with optional leading
# space) are one token each — a cheap, deterministic proxy for BPE token
# counts on normalized text.
BPEISH_TOKEN_RE = r" ?[a-z]+| ?[0-9]+| ?[^a-z0-9 ]+"


def q_doc_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    norm = _norm_text(F.col("text"))
    return d.select(
        "doc_id",
        F.when(norm == "", F.lit(0)).otherwise(F.size(F.split(norm, " "))).cast("long").alias("tokens"),
        F.size(F.regexp_extract_all(norm, F.lit(BPEISH_TOKEN_RE), F.lit(0)))
        .cast("long")
        .alias("bpeish_tokens"),
    )


DOC_TOKEN_COUNT_SQL = f"""
SELECT doc_id,
       CASE WHEN {_NORM_SQL} = '' THEN 0
            ELSE len(string_split({_NORM_SQL}, ' ')) END AS tokens,
       len(regexp_extract_all({_NORM_SQL}, '{BPEISH_TOKEN_RE}')) AS bpeish_tokens
FROM documents
"""


def q_doc_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality features: chars, tokens, mean token length, punctuation ratio."""
    d = _docs(spark, sf_dir)
    norm = _norm_text(F.col("text"))
    chars = F.length(F.col("text"))
    tokens = F.when(norm == "", F.lit(0)).otherwise(F.size(F.split(norm, " ")))
    punct = chars - F.length(F.regexp_replace(F.col("text"), r"[.,!?;:]", ""))
    return d.select(
        "doc_id",
        chars.cast("long").alias("chars"),
        tokens.cast("long").alias("tokens"),
        F.round(punct / F.greatest(chars, F.lit(1)), 5).alias("punct_ratio"),
        F.round(
            (F.length(F.regexp_replace(norm, " ", "")))
            / F.greatest(tokens, F.lit(1)),
            4,
        ).alias("mean_token_len"),
    )


DOC_QUALITY_SQL = f"""
SELECT doc_id,
       length(text) AS chars,
       CASE WHEN {_NORM_SQL} = '' THEN 0 ELSE len(string_split({_NORM_SQL}, ' ')) END AS tokens,
       ROUND((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
             / GREATEST(length(text), 1), 5) AS punct_ratio,
       ROUND(length(replace({_NORM_SQL}, ' ', ''))
             / GREATEST(CASE WHEN {_NORM_SQL} = '' THEN 0 ELSE len(string_split({_NORM_SQL}, ' ')) END, 1), 4) AS mean_token_len
FROM documents
"""


# stopword alternations per language (tiny, deterministic scoring sets)
_LANG_PATTERNS = {
    "en": r"\b(the|and|of|to|in|is|that|for|with|was)\b",
    "de": r"\b(der|die|das|und|ist|nicht|ein|mit|für|auf)\b",
    "fr": r"\b(le|la|les|et|est|une|des|dans|pour|que)\b",
    "es": r"\b(el|la|los|las|es|una|para|con|del|por)\b",
    "zh": r"(的|是|了|在|和|有|我|不|这|人)",
}
_LANG_ORDER = ["de", "en", "es", "fr", "zh"]  # tie-break: alphabetical


def q_doc_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heuristic language ID: stopword-hit counts per language, argmax with
    alphabetical tie-break. (A real pipeline would swap in fastText/CLD3;
    the Spark-side shape — score columns + argmax — is the same.)"""
    d = _docs(spark, sf_dir)
    lowered = F.lower(F.col("text"))
    scored = d.select(
        "doc_id",
        "lang",
        *[
            F.size(F.regexp_extract_all(lowered, F.lit(pat), F.lit(0))).alias(f"s_{lang}")
            for lang, pat in _LANG_PATTERNS.items()
        ],
    )
    pairs = F.array(
        *[
            F.struct((-F.col(f"s_{lang}")).alias("neg"), F.lit(lang).alias("lang"))
            for lang in _LANG_ORDER
        ]
    )
    return scored.select(
        "doc_id",
        F.array_min(pairs)["lang"].alias("predicted_lang"),
        F.col("lang").alias("actual_lang"),
    )


def _lang_sql() -> str:
    scores = ",\n       ".join(
        f"len(regexp_extract_all(lower(text), '{pat}')) AS s_{lang}"
        for lang, pat in _LANG_PATTERNS.items()
    )
    # argmax with alphabetical tie-break via a sorted struct list
    structs = ", ".join(f"{{'neg': -s_{lang}, 'lang': '{lang}'}}" for lang in _LANG_ORDER)
    return f"""
WITH scored AS (
    SELECT doc_id, lang,
       {scores}
    FROM documents
)
SELECT doc_id,
       list_sort([{structs}])[1].lang AS predicted_lang,
       lang AS actual_lang
FROM scored
"""


DOC_LANG_ID_SQL = _lang_sql()


def q_doc_lang_quality_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus roll-up: per (source, lang) doc counts + avg length (the
    "what's in my crawl" query every pipeline runs first)."""
    d = _docs(spark, sf_dir)
    return (
        d.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
        .orderBy("source", "lang")
    )


DOC_LANG_QUALITY_SQL = """
SELECT source, lang, COUNT(*) AS docs, ROUND(AVG(n_chars), 2) AS avg_chars
FROM documents GROUP BY source, lang ORDER BY source, lang
"""


def q_doc_rolling_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive document fingerprint: md5 over the running
    concatenation of token md5 prefixes (a rolling-hash-style signature that
    distinguishes permuted documents, unlike the bag-of-shingles md5)."""
    d = _docs(spark, sf_dir)
    norm = _norm_text(F.col("text"))
    toks = F.split(norm, " ")
    rolled = F.md5(
        F.array_join(F.transform(toks, lambda t: F.substring(F.md5(t), 1, 8)), "")
    )
    return d.select("doc_id", rolled.alias("rolling_fp"))


DOC_ROLLING_FP_SQL = f"""
SELECT doc_id,
       md5(array_to_string(list_transform(string_split({_NORM_SQL}, ' '),
                                          t -> substr(md5(t), 1, 8)), '')) AS rolling_fp
FROM documents
"""


# ------------------------------------------------- merged per-doc scans

def q_doc_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both fingerprint flavors in ONE scan of documents: the bag
    fingerprint (md5 of normalized text — order of identical content
    collapses) and the order-sensitive rolling fingerprint (md5 over the
    running concatenation of per-token md5 prefixes, distinguishing
    permuted documents). One linear pass; same semantics as the individual
    q_doc_fingerprint / q_doc_rolling_fingerprint operators."""
    d = _docs(spark, sf_dir)
    norm = _norm_text(F.col("text"))
    rolled = F.md5(
        F.array_join(
            F.transform(F.split(norm, " "), lambda t: F.substring(F.md5(t), 1, 8)), ""
        )
    )
    return d.select(
        "doc_id",
        F.md5(norm).alias("fingerprint"),
        rolled.alias("rolling_fp"),
    )


DOC_FINGERPRINTS_SQL = f"""
SELECT doc_id,
       md5({_NORM_SQL}) AS fingerprint,
       md5(array_to_string(list_transform(string_split({_NORM_SQL}, ' '),
                                          t -> substr(md5(t), 1, 8)), '')) AS rolling_fp
FROM documents
"""


def q_doc_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (C11), quality scoring (C10), language ID (C9) and
    Gopher-style repetition signals in ONE scan of documents — the per-doc
    metrics a training-data pipeline computes together in practice (each
    is an independent column family on the same pass; semantics identical
    to the individual q_doc_token_count / q_doc_quality / q_doc_lang_id
    operators).

    PII-density columns (``n_emails``, ``n_urls``) count scrub targets per
    doc — the filter signal; ``scrub_text`` is the matching redaction
    transform using the same patterns.

    Repetition columns (the standard pretraining quality filters, Gopher
    §A1.1 family): ``dup_word_frac`` = 1 - |distinct tokens|/|tokens|,
    and ``top_bigram_frac`` = occurrences of the most frequent word
    bigram / total bigrams. Both are per-row array expressions —
    JVM-side, no shuffle; the top-bigram count is O(k^2) in the per-doc
    DISTINCT bigram count, bounded by document length, never corpus
    size."""
    d = _docs(spark, sf_dir)
    norm = _norm_text(F.col("text"))
    lowered = F.lower(F.col("text"))
    chars = F.length(F.col("text"))
    toks = F.split(norm, " ")
    tokens = F.when(norm == "", F.lit(0)).otherwise(F.size(toks))
    punct = chars - F.length(F.regexp_replace(F.col("text"), r"[.,!?;:]", ""))
    bigrams = F.when(
        tokens >= 2,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - F.lit(2)),
            lambda i: F.array_join(F.slice(toks, i + 1, 2), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    # most-frequent-bigram count in O(k log k): sort the bigram array and
    # take the longest run of equal neighbors (a distinct×scan formulation
    # is O(k^2) per doc — noticeable on crawl-length documents; the DuckDB
    # oracle keeps the quadratic spelling, same result). The "" initial
    # accumulator can never equal a real bigram (tokens are non-empty).
    sorted_bg = F.array_sort(bigrams)
    run_best = F.aggregate(
        sorted_bg,
        F.struct(
            F.lit("").alias("prev"), F.lit(0).alias("run"), F.lit(0).alias("best")
        ),
        lambda acc, x: F.struct(
            x.alias("prev"),
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"],
                F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
            ).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_bigram = F.when(
        F.size(bigrams) > 0, run_best / F.size(bigrams)
    ).otherwise(F.lit(0.0))
    dup_words = F.when(
        tokens > 0, 1.0 - F.size(F.array_distinct(toks)) / tokens
    ).otherwise(F.lit(0.0))
    lang_pairs = F.array(
        *[
            F.struct(
                (
                    -F.size(
                        F.regexp_extract_all(lowered, F.lit(_LANG_PATTERNS[lang]), F.lit(0))
                    )
                ).alias("neg"),
                F.lit(lang).alias("lang"),
            )
            for lang in _LANG_ORDER
        ]
    )
    return d.select(
        "doc_id",
        chars.cast("long").alias("chars"),
        tokens.cast("long").alias("tokens"),
        F.size(F.regexp_extract_all(norm, F.lit(BPEISH_TOKEN_RE), F.lit(0)))
        .cast("long")
        .alias("bpeish_tokens"),
        F.round(punct / F.greatest(chars, F.lit(1)), 5).alias("punct_ratio"),
        F.round(
            (F.length(F.regexp_replace(norm, " ", ""))) / F.greatest(tokens, F.lit(1)),
            4,
        ).alias("mean_token_len"),
        F.round(dup_words, 4).alias("dup_word_frac"),
        F.round(top_bigram, 4).alias("top_bigram_frac"),
        F.size(F.regexp_extract_all(lowered, F.lit(PII_EMAIL_RE), F.lit(0)))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(lowered, F.lit(PII_URL_RE), F.lit(0)))
        .cast("long")
        .alias("n_urls"),
        F.array_min(lang_pairs)["lang"].alias("predicted_lang"),
        F.col("lang").alias("actual_lang"),
    )


def _doc_text_metrics_sql() -> str:
    toks = f"CASE WHEN {_NORM_SQL} = '' THEN 0 ELSE len(string_split({_NORM_SQL}, ' ')) END"
    structs = ", ".join(
        f"{{'neg': -len(regexp_extract_all(lower(text), '{_LANG_PATTERNS[lang]}')), 'lang': '{lang}'}}"
        for lang in _LANG_ORDER
    )
    return f"""
WITH base AS (
    SELECT doc_id, text, lang,
           string_split({_NORM_SQL}, ' ') AS words,
           {toks} AS tokens
    FROM documents
),
bg AS (
    SELECT *,
           CASE WHEN tokens >= 2 THEN
               list_transform(range(len(words) - 1),
                              i -> array_to_string(words[i + 1 : i + 2], ' '))
           ELSE [] END AS bigrams
    FROM base
)
SELECT doc_id,
       length(text) AS chars,
       tokens,
       len(regexp_extract_all({_NORM_SQL}, '{BPEISH_TOKEN_RE}')) AS bpeish_tokens,
       ROUND((length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')))
             / GREATEST(length(text), 1), 5) AS punct_ratio,
       ROUND(length(replace({_NORM_SQL}, ' ', '')) / GREATEST(tokens, 1), 4) AS mean_token_len,
       ROUND(CASE WHEN tokens > 0
                  THEN 1.0 - len(list_distinct(words)) / tokens
                  ELSE 0.0 END, 4) AS dup_word_frac,
       ROUND(CASE WHEN len(bigrams) > 0
                  THEN list_max(list_transform(list_distinct(bigrams),
                                               x -> len(list_filter(bigrams, b -> b = x))))
                       / len(bigrams)
                  ELSE 0.0 END, 4) AS top_bigram_frac,
       len(regexp_extract_all(lower(text), '{PII_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(lower(text), '{PII_URL_RE}')) AS n_urls,
       list_sort([{structs}])[1].lang AS predicted_lang,
       lang AS actual_lang
FROM bg
"""


DOC_TEXT_METRICS_SQL = _doc_text_metrics_sql()
