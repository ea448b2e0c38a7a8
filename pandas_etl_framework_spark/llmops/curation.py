"""Corpus-curation operators: PII detection/redaction and boilerplate
n-gram detection over the ``documents`` table.

The reference framework has no text pipeline (SURVEY.md §2.6 — capability
parity surface); these are the curation passes a large-scale training-data
pipeline runs before historization. Both are pure built-in regex/array
expressions (JVM-side, whole-stage codegen; zero Python UDFs):

- PII redaction scans each document once per pattern class and rewrites it
  — embarrassingly parallel, no shuffle at all; at 100 TB it is a pure
  map stage pinned to the parquet scan.
- Boilerplate detection explodes word 3-grams and counts document
  frequency per gram: one shuffle on the gram key with map-side partial
  aggregation; the corpus-frequent tail (the only part anyone reads) is
  top-k bounded. Regex/array syntax is kept to the subset Java regex and
  RE2 share so the DuckDB oracle matches bit-for-bit.

The synthetic corpus contains no real PII, so the PII query deterministically
augments each doc with synthetic contact strings derived from ``doc_id``
before scanning — the operator's regex/redaction path is what's under test.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .text import _docs, tokens_col

# Patterns restricted to the Java-regex ∩ RE2 common subset.
EMAIL_RE = r"[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"
PHONE_RE = r"555-[0-9]{4}"
IP_RE = r"10\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def _augmented_text() -> F.Column:
    """Deterministic synthetic PII spliced into each doc (corpus is clean)."""
    return F.concat(
        F.col("text"),
        F.lit(" contact user"),
        F.col("doc_id").cast("string"),
        F.lit("@mail.example or admin"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("@corp.example phone 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ip 10."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".0."),
        (F.col("doc_id") % 100).cast("string"),
    )


def redact_pii(df, text_col: str = "text"):
    """Replace email / phone / IPv4 matches with typed placeholder tokens
    and count each class. Single narrow projection — no shuffle."""
    t = F.col(text_col)
    n_emails = F.regexp_count(t, F.lit(EMAIL_RE))
    n_phones = F.regexp_count(t, F.lit(PHONE_RE))
    n_ips = F.regexp_count(t, F.lit(IP_RE))
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
        ),
        IP_RE,
        "<IP>",
    )
    return df.select(
        "doc_id",
        n_emails.alias("n_emails"),
        n_phones.alias("n_phones"),
        n_ips.alias("n_ips"),
        F.length(redacted).alias("redacted_len"),
        F.md5(redacted).alias("redacted_md5"),
    )


def q_text_pii_redact(spark, sf_dir):
    aug = _docs(spark, sf_dir).select("doc_id", _augmented_text().alias("text"))
    return redact_pii(aug)


SQL_TEXT_PII_REDACT = rf"""
WITH aug AS (
    SELECT doc_id,
           text || ' contact user' || CAST(doc_id AS VARCHAR)
                || '@mail.example or admin' || CAST(doc_id % 7 AS VARCHAR)
                || '@corp.example phone 555-'
                || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                || ' ip 10.' || CAST(doc_id % 256 AS VARCHAR)
                || '.0.' || CAST(doc_id % 100 AS VARCHAR) AS text
    FROM documents
),
red AS (
    SELECT doc_id,
           LEN(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
           LEN(regexp_extract_all(text, '{PHONE_RE}')) AS n_phones,
           LEN(regexp_extract_all(text, '{IP_RE}')) AS n_ips,
           regexp_replace(
               regexp_replace(
                   regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                   '{PHONE_RE}', '<PHONE>', 'g'),
               '{IP_RE}', '<IP>', 'g') AS redacted
    FROM aug
)
SELECT doc_id, n_emails, n_phones, n_ips,
       LENGTH(redacted) AS redacted_len,
       md5(redacted) AS redacted_md5
FROM red
"""


# --------------------------------------------------------------------------
# Boilerplate n-gram detection
# --------------------------------------------------------------------------

BOILERPLATE_N = 3
BOILERPLATE_MIN_DOCS = 5


def boilerplate_ngrams(df, min_docs: int = BOILERPLATE_MIN_DOCS):
    """Word 3-grams occurring in >= ``min_docs`` distinct documents, by
    descending document frequency. One shuffle (gram key) with map-side
    partial aggregation; output is top-k bounded so the driver never sees
    the full gram space."""
    toks = df.select("doc_id", tokens_col().alias("t")).filter(
        F.size("t") >= BOILERPLATE_N
    )
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 2),"
                " i -> concat_ws(' ', element_at(t, i),"
                " element_at(t, i + 1), element_at(t, i + 2)))"
            )
        ).alias("gram"),
    )
    return (
        grams.groupBy("gram")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.count("*").alias("n_occ"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .orderBy(F.col("n_docs").desc(), F.col("n_occ").desc(), "gram")
        .limit(100)
    )


def q_text_boilerplate(spark, sf_dir):
    return boilerplate_ngrams(_docs(spark, sf_dir))


SQL_TEXT_BOILERPLATE = rf"""
WITH toks AS (
    SELECT doc_id, string_split_regex(trim(text), '\s+') AS t
    FROM documents
),
grams AS (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
               AS gram
    FROM toks
    WHERE len(t) >= {BOILERPLATE_N}
)
SELECT gram, COUNT(DISTINCT doc_id) AS n_docs, COUNT(*) AS n_occ
FROM grams
GROUP BY gram
HAVING COUNT(DISTINCT doc_id) >= {BOILERPLATE_MIN_DOCS}
ORDER BY n_docs DESC, n_occ DESC, gram
LIMIT 100
"""


# --------------------------------------------------------------------------
# Quality-weighted sampling
# --------------------------------------------------------------------------

_SAMPLE_MOD = 1_000_000


def quality_weighted_sample(df):
    """Keep each document with probability = its quality score, driven by a
    content-stable hash instead of an RNG: Bernoulli(score) per doc,
    deterministic across runs, engines, and partitionings — re-running the
    pipeline reproduces the identical corpus. Pure filter, no shuffle; at
    100 TB this composes with the scan like any pushed predicate."""
    from .text import quality_ratio_cols

    _, _, _, score = quality_ratio_cols()
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % _SAMPLE_MOD
    )
    return (
        df.select("doc_id", score.alias("quality_score"), bucket.alias("bucket"))
        .filter(F.col("bucket") < F.floor(F.col("quality_score") * _SAMPLE_MOD))
        .select("doc_id", "quality_score")
    )


def q_text_quality_sample(spark, sf_dir):
    return quality_weighted_sample(_docs(spark, sf_dir))


def _sql_quality_sample() -> str:
    from ..sketches import _sql_hex_to_long
    from .text import STOPWORDS

    stop_pred = " OR ".join(f"x = '{w}'" for w in STOPWORDS)
    bucket = _sql_hex_to_long("md5(CAST(doc_id AS VARCHAR))", 1, 8)
    return rf"""
WITH toks AS (
    SELECT doc_id, text, string_split_regex(trim(text), '\s+') AS t
    FROM documents
),
feat AS (
    SELECT doc_id,
           CAST(LEN(list_filter(t, x -> {stop_pred})) AS DOUBLE) / LEN(t)
               AS stop_ratio,
           CAST(LENGTH(text)
                - LENGTH(regexp_replace(text, '[.,!?;:''"()\[\]{{}}]', '', 'g'))
                AS DOUBLE) / LENGTH(text) AS punct_ratio,
           CAST(LEN(list_distinct(t)) AS DOUBLE) / LEN(t) AS uniq_ratio,
           {bucket} % {_SAMPLE_MOD} AS bucket
    FROM toks
),
scored AS (
    SELECT doc_id,
           stop_ratio * 0.3 + uniq_ratio * 0.5 + (1.0 - punct_ratio) * 0.2
               AS quality_score,
           bucket
    FROM feat
)
SELECT doc_id, quality_score
FROM scored
WHERE bucket < CAST(floor(quality_score * {_SAMPLE_MOD}) AS BIGINT)
"""


SQL_TEXT_QUALITY_SAMPLE = _sql_quality_sample()


# --------------------------------------------------------------------------
# Exact-k weighted sampling (Efraimidis–Spirakis order sampling)
# --------------------------------------------------------------------------

RESERVOIR_K = 50
_U_MOD = 2**32


def weighted_sample_exact_k(
    df, weight_col: str, k: int = RESERVOIR_K
):
    """Draw EXACTLY k rows with inclusion odds proportional to ``weight_col``
    (Efraimidis–Spirakis A-ES order sampling, IPL 2006): each row gets key
    ln(u)/w for u ~ U(0,1] and the k largest keys win.  Bernoulli sampling
    (quality_weighted_sample) gives a random-size sample; this gives a fixed
    budget — 'pick the best 10M documents for this mixture' — in one pass.

    Determinism: u is hash-derived (md5 of doc_id), not an RNG, and ln(u) is
    quantized to a 1e-9 grid BIGINT before the one IEEE division by w — the
    ranking is engine- and partitioning-stable, and re-runs reproduce the
    same sample (the reproducibility property the whole curation family
    maintains).

    Scale: the key is a pure projection; selection is a global top-k, which
    Spark executes as per-partition top-k + a k-row driver merge
    (TakeOrdered), never a full sort of the corpus.
    """
    u = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("double")
        + 1.0
    ) / _U_MOD
    key = (
        F.floor(F.log(u) * 1_000_000_000).cast("bigint").cast("double")
        / F.col(weight_col).cast("double")
    )
    w = Window.orderBy(F.col("es_key").desc(), F.col("doc_id").asc())
    return (
        df.select("doc_id", F.col(weight_col).alias("weight"), key.alias("es_key"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("doc_id", "weight", "rk")
    )


def q_text_weighted_reservoir(spark, sf_dir):
    return weighted_sample_exact_k(_docs(spark, sf_dir), "n_chars")


def _sql_weighted_reservoir() -> str:
    from ..sketches import _sql_hex_to_long

    u = (
        f"((CAST({_sql_hex_to_long('md5(CAST(doc_id AS VARCHAR))', 1, 8)}"
        f" AS DOUBLE) + 1.0) / {_U_MOD})"
    )
    return f"""
WITH keyed AS (
    SELECT doc_id, n_chars AS weight,
           CAST(CAST(FLOOR(LN({u}) * 1000000000) AS BIGINT) AS DOUBLE)
               / CAST(n_chars AS DOUBLE) AS es_key
    FROM documents
),
ranked AS (
    SELECT doc_id, weight,
           ROW_NUMBER() OVER (ORDER BY es_key DESC, doc_id ASC) AS rk
    FROM keyed
)
SELECT doc_id, weight, CAST(rk AS INTEGER) AS rk
FROM ranked WHERE rk <= {RESERVOIR_K}
"""


# --------------------------------------------------------------------------
# Source-mixture rebalancing (domain mixing)
# --------------------------------------------------------------------------

def source_mixture(docs, target_share_mod: int = _SAMPLE_MOD):
    """Rebalance the corpus toward a UNIFORM per-source token budget:
    sources over their share are deterministically downsampled, sources at
    or under theirs are kept whole — the static domain-mixing step of a
    pretraining data pipeline (each corpus slice gets a token budget; the
    sampler enforces it).

    keep-rate_s = min(1, T / (k * S_s)) where S_s is the source's token
    count, T the corpus total, and k the number of sources. The Bernoulli
    draw reuses the content-stable md5 bucket of quality_weighted_sample
    (deterministic across runs/engines/partitionings), and the rate
    compare is exact integer arithmetic:
    keep  <=>  bucket * k * S_s < T * MOD.
    Overflow bound: bucket < MOD = 1e6, so the left product stays under
    2^63 while k * S_s < 9.2e12 — beyond that, pre-divide the rational
    (both sides by gcd or by MOD) before comparing.

    One aggregate for the per-source totals (k rows, broadcast back), one
    singleton for (T, k) — the per-doc decision is then a pure projection
    that composes with the scan; no extra shuffle of the corpus.
    """
    n_tokens = F.size(tokens_col()).cast("long")
    d = docs.select("doc_id", "source", n_tokens.alias("n_tokens"))
    per_src = d.groupBy("source").agg(F.sum("n_tokens").alias("src_tokens"))
    totals = per_src.agg(
        F.sum("src_tokens").alias("total_tokens"),
        F.count(F.lit(1)).alias("n_sources"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % target_share_mod
    )
    return (
        d.join(F.broadcast(per_src), "source")
        .crossJoin(F.broadcast(totals))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "src_tokens",
            bucket.alias("bucket"),
            (
                bucket * F.col("n_sources") * F.col("src_tokens")
                < F.col("total_tokens") * F.lit(target_share_mod)
            ).alias("kept"),
        )
    )


def q_text_source_mixture(spark, sf_dir):
    return source_mixture(_docs(spark, sf_dir))


def _sql_source_mixture() -> str:
    from ..sketches import _sql_hex_to_long

    bucket = _sql_hex_to_long("md5(CAST(doc_id AS VARCHAR))", 1, 8)
    return rf"""
WITH d AS (
    SELECT doc_id, source,
           CAST(LEN(string_split_regex(trim(text), '\s+')) AS BIGINT)
               AS n_tokens
    FROM documents
),
s AS (
    SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
    FROM d GROUP BY source
),
t AS (
    SELECT CAST(SUM(src_tokens) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_sources
    FROM s
)
SELECT d.doc_id, d.source, d.n_tokens, s.src_tokens,
       {bucket} % {_SAMPLE_MOD} AS bucket,
       ({bucket} % {_SAMPLE_MOD}) * t.n_sources * s.src_tokens
           < t.total_tokens * {_SAMPLE_MOD} AS kept
FROM d JOIN s USING (source) CROSS JOIN t
"""


SQL_TEXT_SOURCE_MIXTURE = _sql_source_mixture()


# --------------------------------------------------------------------------
# Temperature-based source mixing (sqrt-scaling multilingual sampler)
# --------------------------------------------------------------------------

_TEMP_MOD = 10_000


def temperature_mixture(docs, mod: int = _TEMP_MOD):
    """Rebalance source shares toward ``S_s^alpha`` with alpha = 1/2 —
    the standard temperature sampler for heterogeneous pretraining mixes
    (multilingual corpora, web-vs-books): big sources are tempered, small
    ones up-weighted relative to proportional sampling, without ever
    starving either. Keep-rate_s = (S_min / S_s)^(1/2), so the SMALLEST
    source is kept whole and expected kept-token counts are proportional
    to sqrt(S_s).

    The draw reuses the content-stable md5 bucket (deterministic across
    runs/engines/partitionings), and the alpha=1/2 rate compare needs NO
    floating point at all — square both sides:
    keep  <=>  bucket^2 * S_s < mod^2 * S_min.
    Overflow bound: bucket < mod = 1e4 keeps the left product under 2^63
    while S_s < 9.2e10 tokens per source; shrink ``mod`` (rate
    granularity) before that, or pre-divide both sides.

    Same shape as :func:`source_mixture`: one k-row per-source aggregate
    broadcast back, a 1-row singleton for S_min, then the per-doc
    decision is a pure projection composed with the scan."""
    n_tokens = F.size(tokens_col()).cast("long")
    d = docs.select("doc_id", "source", n_tokens.alias("n_tokens"))
    per_src = d.groupBy("source").agg(F.sum("n_tokens").alias("src_tokens"))
    mins = per_src.agg(F.min("src_tokens").alias("min_tokens"))
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % mod
    )
    return (
        d.join(F.broadcast(per_src), "source")
        .crossJoin(F.broadcast(mins))
        .select(
            "doc_id",
            "source",
            "n_tokens",
            "src_tokens",
            "min_tokens",
            bucket.alias("bucket"),
            (
                bucket * bucket * F.col("src_tokens")
                < F.lit(mod) * F.lit(mod) * F.col("min_tokens")
            ).alias("kept"),
        )
    )


def q_text_temperature_mixture(spark, sf_dir):
    return temperature_mixture(_docs(spark, sf_dir))


def _sql_temperature_mixture() -> str:
    from ..sketches import _sql_hex_to_long

    bucket = f"({_sql_hex_to_long('md5(CAST(doc_id AS VARCHAR))', 1, 8)}" \
        f" % {_TEMP_MOD})"
    return rf"""
WITH d AS (
    SELECT doc_id, source,
           CAST(LEN(string_split_regex(trim(text), '\s+')) AS BIGINT)
               AS n_tokens
    FROM documents
),
s AS (
    SELECT source, CAST(SUM(n_tokens) AS BIGINT) AS src_tokens
    FROM d GROUP BY source
),
m AS (SELECT CAST(MIN(src_tokens) AS BIGINT) AS min_tokens FROM s)
SELECT d.doc_id, d.source, d.n_tokens, s.src_tokens, m.min_tokens,
       {bucket} AS bucket,
       {bucket} * {bucket} * s.src_tokens
           < {_TEMP_MOD} * {_TEMP_MOD} * m.min_tokens AS kept
FROM d JOIN s USING (source) CROSS JOIN m
"""


SQL_TEXT_TEMPERATURE_MIXTURE = _sql_temperature_mixture()


# --------------------------------------------------------------------------
# Deterministic global shuffle + shard assignment (training order)
# --------------------------------------------------------------------------

SHUFFLE_SHARDS = 16
_HEXDIGITS = "0123456789abcdef"


def shuffle_shard(
    docs,
    n_shards: int = SHUFFLE_SHARDS,
    id_col: str = "doc_id",
    salt: str = "epoch0",
):
    """Assign every document a (shard, pos) training-order coordinate:
    shard from the first md5 byte of salt:id, position by md5-lexicographic
    order within the shard — a reproducible global shuffle (changing
    ``salt`` re-shuffles per epoch) with no randomness at run time.

    This windowed form is the oracle-checkable shape. The writer path for
    actual shard files is ``write_training_shards``: repartitionByRange on
    (shard, h) + sortWithinPartitions — a single range-shuffle whose
    per-task sort replaces the window, the standard way to materialize a
    shuffled corpus at any scale.
    """
    h = F.md5(
        F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))
    )
    d1 = F.instr(F.lit(_HEXDIGITS), F.substring(F.col("h"), 1, 1)) - 1
    d2 = F.instr(F.lit(_HEXDIGITS), F.substring(F.col("h"), 2, 1)) - 1
    with_h = docs.select(id_col, h.alias("h")).withColumn(
        "shard", ((d1 * 16 + d2) % n_shards).cast("long")
    )
    w = Window.partitionBy("shard").orderBy("h", id_col)
    return with_h.select(
        id_col,
        "shard",
        F.row_number().over(w).cast("long").alias("pos"),
    )


def write_training_shards(
    docs,
    path: str,
    n_shards: int = SHUFFLE_SHARDS,
    id_col: str = "doc_id",
    salt: str = "epoch0",
) -> None:
    """Materialize the shuffled corpus as hive-partitioned shard files in
    shuffle order: one range shuffle (repartitionByRange) + an in-task
    sort — no global window, no driver state; scales with executor count."""
    h = F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    d1 = F.instr(F.lit(_HEXDIGITS), F.substring(F.col("h"), 1, 1)) - 1
    d2 = F.instr(F.lit(_HEXDIGITS), F.substring(F.col("h"), 2, 1)) - 1
    (
        docs.withColumn("h", h)
        .withColumn("shard", ((d1 * 16 + d2) % n_shards).cast("long"))
        .repartitionByRange(n_shards, "shard", "h")
        .sortWithinPartitions("shard", "h", id_col)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )


def q_text_shuffle_shard(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return shuffle_shard(docs)


SQL_TEXT_SHUFFLE_SHARD = f"""
WITH h AS (
    SELECT doc_id,
           md5('epoch0:' || CAST(doc_id AS VARCHAR)) AS h
    FROM documents
),
s AS (
    SELECT doc_id, h,
           CAST(((instr('{_HEXDIGITS}', substr(h, 1, 1)) - 1) * 16
                 + instr('{_HEXDIGITS}', substr(h, 2, 1)) - 1)
                % {SHUFFLE_SHARDS} AS BIGINT) AS shard
    FROM h
)
SELECT doc_id, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id)
            AS BIGINT) AS pos
FROM s
"""


# --------------------------------------------------------------------------
# Per-source document cap (RefinedWeb-style domain frequency cap)
# --------------------------------------------------------------------------

DOMAIN_CAP = 15
_CAP_SALT_BUCKETS = 4


def source_doc_cap(
    docs,
    cap: int = DOMAIN_CAP,
    salt_buckets: int = _CAP_SALT_BUCKETS,
):
    """Keep at most ``cap`` documents per source, preferring the longest
    (ties by smallest doc_id) — the RefinedWeb/C4-style domain frequency
    cap that stops a single hot domain from dominating the training mix.

    Distributed as a TWO-PHASE EXACT top-k per key: phase one ranks
    within (source, salt) partitions — ``salt = doc_id % salt_buckets``,
    deterministic — and keeps each partial top-``cap``; phase two ranks
    the ≤ ``salt_buckets * cap`` survivors per source and keeps the
    global top-``cap``. The union of partial top-k sets provably
    contains the global top-k, so the result is exactly the single-
    window answer — but the heavy first window never sees more than a
    salt-bucket slice of a hot domain, which is what a single
    ``Window.partitionBy(source)`` gets wrong at 100 TB (one straggler
    task owning the hottest domain's billions of rows). ``salt_buckets``
    scales with expected per-domain skew.

    Output: (doc_id, source, n_chars, rank_in_source), kept rows only.
    """
    w1 = Window.partitionBy("source", "salt").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    w2 = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), "doc_id"
    )
    return (
        docs.select(
            "doc_id",
            "source",
            "n_chars",
            (F.col("doc_id") % salt_buckets).alias("salt"),
        )
        .withColumn("rk1", F.row_number().over(w1))
        .filter(F.col("rk1") <= cap)
        .withColumn("rank_in_source", F.row_number().over(w2))
        .filter(F.col("rank_in_source") <= cap)
        .select("doc_id", "source", "n_chars", "rank_in_source")
    )


def q_text_domain_cap(spark, sf_dir):
    """Driver row for the domain cap: the two-phase salted top-k must
    equal the oracle's single global window exactly."""
    return source_doc_cap(_docs(spark, sf_dir))


# Oracle: ONE global window — the two-phase plan must match it row-for-row.
SQL_TEXT_DOMAIN_CAP = f"""
WITH ranked AS (
    SELECT doc_id, source, n_chars,
           CAST(ROW_NUMBER() OVER (
               PARTITION BY source ORDER BY n_chars DESC, doc_id
           ) AS INT) AS rank_in_source
    FROM documents
)
SELECT doc_id, source, n_chars, rank_in_source
FROM ranked WHERE rank_in_source <= {DOMAIN_CAP}
"""


# --------------------------------------------------------------------------
# Out-of-vocabulary rate vs the corpus top-K vocabulary
# --------------------------------------------------------------------------

OOV_VOCAB_K = 40


def oov_rate(docs, vocab_k: int = OOV_VOCAB_K):
    """Per-document out-of-vocabulary ratio against the corpus's top-K
    words by frequency (ties by word) — the classic cheap garbage signal
    (a doc whose words mostly fall outside the corpus head vocabulary is
    boilerplate, another language, or noise).

    Scale shape: one explode + word-key shuffle builds corpus
    frequencies; the vocabulary cut is K rows (orderBy+limit on the
    AGGREGATED counts — K bounded, so the sort input is |vocab|, not
    |corpus|); the per-doc membership test joins the exploded tokens
    against the K-row vocabulary — legitimately broadcast at any corpus
    size since K is a constant. Counts are exact integers; the single
    ratio division is performed identically on both engines.

    Output: (doc_id, n_tokens, n_oov, oov_ratio).
    """
    toks = docs.select(
        "doc_id", F.explode(tokens_col()).alias("word")
    )
    vocab = (
        toks.groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.col("freq").desc(), "word")
        .limit(vocab_k)
        .select("word")
    )
    flagged = toks.join(
        F.broadcast(vocab).withColumn("in_vocab", F.lit(1)), "word", "left"
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "n_oov",
            (F.col("n_oov").cast("double") / F.col("n_tokens")).alias(
                "oov_ratio"
            ),
        )
    )


def q_text_oov_rate(spark, sf_dir):
    return oov_rate(_docs(spark, sf_dir))


SQL_TEXT_OOV_RATE = f"""
WITH toks AS (
    SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS word
    FROM documents
),
vocab AS (
    SELECT word FROM (
        SELECT word, COUNT(*) AS freq,
               ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, word) AS rk
        FROM toks GROUP BY word
    ) WHERE rk <= {OOV_VOCAB_K}
)
SELECT t.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_tokens,
       CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_oov,
       CAST(SUM(CASE WHEN v.word IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
           / COUNT(*) AS oov_ratio
FROM toks t LEFT JOIN vocab v ON t.word = v.word
GROUP BY t.doc_id
"""


# --------------------------------------------------------------------------
# DSIR importance resampling (Xie et al. 2023, arXiv:2302.03169)
# --------------------------------------------------------------------------

DSIR_BUCKETS = 1024          # paper uses 10k; any fixed B stays broadcastable
DSIR_TARGET_SOURCE = "src1"  # gate fixture: src1 is the target domain


def _dsir_feature_rows(docs, text_col: str = "text"):
    """(doc_id, is_target, bucket) with multiplicity: hashed unigram +
    word-bigram features, md5-bucketed so the DuckDB twin is bit-identical
    (same _sql_hex_base fold as the MinHash family)."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    d = docs.select("doc_id", "is_target", toks.alias("t"))
    n = F.size(F.col("t"))
    bigrams = F.zip_with(
        F.slice(F.col("t"), 1, n - 1),
        F.slice(F.col("t"), 2, n - 1),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return d.select(
        "doc_id",
        "is_target",
        F.explode(F.concat(F.col("t"), bigrams)).alias("feat"),
    ).select(
        "doc_id",
        "is_target",
        (
            F.conv(F.substring(F.md5(F.col("feat")), 1, 8), 16, 10).cast(
                "long"
            )
            % DSIR_BUCKETS
        ).alias("bucket"),
    )


def dsir_bucket_weights(feats) -> "F.DataFrame":
    """Per-bucket quantized importance log-ratio
    ``w_q = floor(1e6 * ln( p_target(b) / p_raw(b) ))`` with add-one
    smoothing over the fixed B-bucket hashed-n-gram space — the DSIR
    importance estimator. The table is at most B rows (driver-sized at
    any corpus scale), built by ONE map-side-combined aggregation; the
    ln argument is a single IEEE division of exact integer products, so
    the quantized weight is engine-portable (same pattern as the
    unigram-surprisal LM)."""
    from .indexing import LN_SCALE

    w = feats.groupBy("bucket").agg(
        F.sum(F.when(F.col("is_target"), 1).otherwise(0)).alias("ct"),
        F.sum(F.when(~F.col("is_target"), 1).otherwise(0)).alias("cr"),
    )
    tot = w.agg(F.sum("ct").alias("nt"), F.sum("cr").alias("nr"))
    # double products, not integer: count*count overflows BIGINT at real
    # corpus scale, and IEEE multiply/divide round identically on both
    # engines so portability is unaffected
    num = (F.col("ct") + 1).cast("double") * (
        F.col("nr") + DSIR_BUCKETS
    ).cast("double")
    den = (F.col("cr") + 1).cast("double") * (
        F.col("nt") + DSIR_BUCKETS
    ).cast("double")
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            F.floor(F.log(num / den) * LN_SCALE).cast("bigint").alias("w_q"),
        )
    )


def dsir_scores(docs, is_target, text_col: str = "text"):
    """DSIR data selection: score every RAW (non-target) document by the
    summed importance log-ratio of its hashed n-gram features against the
    target domain — documents whose feature distribution looks like the
    target get positive scores and the ``selected`` flag. This is the
    published importance-resampling recipe for picking pretraining data
    that matches a high-quality target corpus, without training a model.

    Scale shape: one explode (map-local), one B-row weight aggregation,
    then a BROADCAST join of the weight table onto the feature stream and
    a doc-keyed sum — scoring 100 TB shuffles only the per-doc partial
    sums; the corpus-sized feature relation never shuffles."""
    feats = _dsir_feature_rows(
        docs.select("doc_id", is_target.alias("is_target"), text_col),
        text_col,
    ).localCheckpoint(eager=True)
    weights = dsir_bucket_weights(feats)
    return (
        feats.filter(~F.col("is_target"))
        .join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_feats"),
            F.sum("w_q").alias("dsir_score_q"),
        )
        .select(
            "doc_id",
            "n_feats",
            "dsir_score_q",
            (
                F.col("dsir_score_q").cast("double")
                / F.col("n_feats").cast("double")
            ).alias("mean_logratio_micro"),
            (F.col("dsir_score_q") >= 0).alias("selected"),
        )
    )


def q_text_dsir_select(spark, sf_dir):
    """Driver row: DSIR selection of raw docs (every source but 'src1')
    against the 'src1' target domain. The oracle unrolls the full
    estimator — hashed features, smoothed bucket ratios, quantized ln —
    so a biased weight table or a lost feature is a hash mismatch."""
    docs = _docs(spark, sf_dir)
    return dsir_scores(docs, F.col("source") == DSIR_TARGET_SOURCE)


def _sql_text_dsir_select() -> str:
    from .dedup import _sql_hex_base
    from .indexing import LN_SCALE

    b = DSIR_BUCKETS
    return rf"""
WITH d AS (
    SELECT doc_id, source = '{DSIR_TARGET_SOURCE}' AS is_target,
           string_split_regex(trim(text), '\s+') AS t
    FROM documents
),
feats AS (
    SELECT doc_id, is_target, unnest(t) AS feat FROM d
    UNION ALL
    SELECT doc_id, is_target, t[i] || ' ' || t[i + 1] AS feat
    FROM (
        SELECT doc_id, is_target, t,
               unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i
        FROM d
    )
),
bf AS (
    SELECT doc_id, is_target,
           ({_sql_hex_base('md5(feat)')}) % {b} AS bucket
    FROM feats
),
w AS (
    SELECT bucket,
           SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS ct,
           SUM(CASE WHEN is_target THEN 0 ELSE 1 END) AS cr
    FROM bf GROUP BY bucket
),
tot AS (SELECT SUM(ct) AS nt, SUM(cr) AS nr FROM w),
wq AS (
    SELECT bucket,
           CAST(FLOOR(LN(
               (CAST(ct + 1 AS DOUBLE) * CAST(nr + {b} AS DOUBLE))
               / (CAST(cr + 1 AS DOUBLE) * CAST(nt + {b} AS DOUBLE))
           ) * {LN_SCALE}) AS BIGINT) AS w_q
    FROM w CROSS JOIN tot
)
SELECT bf.doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_feats,
       CAST(SUM(w_q) AS BIGINT) AS dsir_score_q,
       CAST(SUM(w_q) AS DOUBLE) / COUNT(*) AS mean_logratio_micro,
       SUM(w_q) >= 0 AS selected
FROM bf JOIN wq USING (bucket)
WHERE NOT bf.is_target
GROUP BY bf.doc_id
"""


SQL_TEXT_DSIR_SELECT = _sql_text_dsir_select()


QUERIES = {
    "text_pii_redact": (q_text_pii_redact, SQL_TEXT_PII_REDACT),
    "text_dsir_select": (q_text_dsir_select, SQL_TEXT_DSIR_SELECT),
    "text_domain_cap": (q_text_domain_cap, SQL_TEXT_DOMAIN_CAP),
    "text_oov_rate": (q_text_oov_rate, SQL_TEXT_OOV_RATE),
    "text_shuffle_shard": (q_text_shuffle_shard, SQL_TEXT_SHUFFLE_SHARD),
    "text_source_mixture": (q_text_source_mixture, SQL_TEXT_SOURCE_MIXTURE),
    "text_temperature_mixture": (
        q_text_temperature_mixture,
        SQL_TEXT_TEMPERATURE_MIXTURE,
    ),
    "text_weighted_reservoir": (
        q_text_weighted_reservoir,
        _sql_weighted_reservoir(),
    ),
    "text_boilerplate": (q_text_boilerplate, SQL_TEXT_BOILERPLATE),
    "text_quality_sample": (q_text_quality_sample, SQL_TEXT_QUALITY_SAMPLE),
}
