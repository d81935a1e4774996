"""Driver-contract queries: each engine operator shape as an SQL-checkable
query over the driver's parquet tables (documents/events/embeddings),
plus the training-data pipeline ops.  Every Spark query here has a
DuckDB twin in ORACLES (same column names, deterministic column types —
ints/strings/fixed-point only, never raw doubles).

Mapping to SURVEY.md §2 operator inventory:
  politeness_rank    F1 priority window + F5 per-key budget rank
  schedule_round     F1+F4+F5 composed (the flagship round shape)
  dedup_anti_join    F4 seen-set anti-join
  priority_topk      F1 priority-first drain (global top-k)
  link_explode       P1/P3 findall -> explode (link expansion)
  link_truncate      F10 anti-ban truncation (slice before explode)
  body_length_filter F9 short-body gate
  rlike_filter       P2/P8 emit-if-match predicate
  regex_field_extract P5/P6 first-submatch ExtraString semantics
  per_source_agg     per-host metrics aggregation (K1 routing shape)
plus training-data ops: text_quality, lang_id, fingerprint, dedup_exact,
dedup_ngram_jaccard, dedup_minhash_lsh, multimodal_decode (+
queries-only: simhash_pairs, ann_lsh_topk, ann_ivf_topk,
winnow_fingerprints, frame_sample).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .functions import dedup, similarity, textops


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


# ------------------------------------------------------------ crawl shapes
def q_politeness_rank(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        _events(spark, sf_dir)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 5)
        .select("user_id", "event_id", "rn")
    )


def q_schedule_round(spark, sf_dir):
    """One politeness round over documents-as-frontier: anti-join the
    'seen' set, then per-source budget rank (top 3 by n_chars desc)."""
    docs = _docs(spark, sf_dir)
    seen = docs.where(F.col("doc_id") % 7 == 0).select("doc_id")
    cand = docs.join(seen, "doc_id", "left_anti")
    w = Window.partitionBy("source").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
        .select("source", "doc_id", "rn")
    )


def q_dedup_anti_join(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    seen = docs.where(F.col("doc_id") % 7 == 0).select("doc_id")
    return docs.join(seen, "doc_id", "left_anti").select("doc_id", "source")


def q_priority_topk(spark, sf_dir):
    return (
        _events(spark, sf_dir)
        .orderBy(F.desc("value"), F.asc("ts"), F.asc("event_id"))
        .limit(100)
        .select("event_id")
    )


def q_link_explode(spark, sf_dir):
    toks = F.regexp_extract_all(F.col("text"), F.lit("[a-z]+"), F.lit(0))
    return (
        _docs(spark, sf_dir)
        .select(F.explode(toks).alias("token"))
        .groupBy("token")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.desc("cnt"), F.asc("token"))
        .limit(20)
    )


def q_link_truncate(spark, sf_dir):
    """F10 anti-ban truncation: keep only the first 3 extracted links
    per page (slice before explode, constant-folded)."""
    toks = F.regexp_extract_all(F.col("text"), F.lit("[a-z]+"), F.lit(0))
    return _docs(spark, sf_dir).select(
        "doc_id", F.explode(F.slice(toks, 1, 3)).alias("token")
    )


def q_body_length_filter(spark, sf_dir):
    """F9 short-body gate: len(body) < threshold -> silently dropped."""
    return (
        _docs(spark, sf_dir)
        .where(F.length("text") >= 800)
        .select("doc_id", F.length("text").alias("body_len"))
    )


def q_rlike_filter(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .where(F.col("text").rlike(r"\bspark\b") & F.col("text").rlike(r"\bmerge\b"))
        .select("doc_id")
    )


def q_regex_field_extract(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id",
        F.regexp_extract("text", r"value ([a-z]+)", 1).alias("next_word"),
    )


def q_per_source_agg(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.max("n_chars").alias("max_chars"),
            F.min("n_chars").alias("min_chars"),
        )
    )


# --------------------------------------------------------- text analysis
def q_text_quality(spark, sf_dir):
    out = textops.quality_features(_docs(spark, sf_dir))
    return out.select(
        "doc_id", "n_tokens_ws", "n_tokens_bpe",
        "stop_ratio_micro", "punct_ratio_micro", "keep",
        textops.lang_guess(F.col("text")).alias("lang_guess"),
    )


def q_fingerprint(spark, sf_dir):
    return _docs(spark, sf_dir).select(
        "doc_id", textops.fingerprint_md5(F.col("text")).alias("fp")
    )


# ----------------------------------------------------------------- dedup
def q_dedup_exact(spark, sf_dir):
    return dedup.dedup_exact(_docs(spark, sf_dir), "doc_id").select(
        "doc_id", "fp", "is_dup"
    )


def q_dedup_ngram_jaccard(spark, sf_dir):
    return dedup.ngram_jaccard_pairs(
        _docs(spark, sf_dir), "doc_id", n=3, threshold_micro=500_000
    )


def q_dedup_minhash_lsh(spark, sf_dir):
    return dedup.minhash_lsh_dedup(
        _docs(spark, sf_dir), "doc_id", n=3, threshold_micro=500_000
    )


def q_simhash_pairs(spark, sf_dir):  # queries-only (xxhash64 kernel)
    return dedup.simhash_near_pairs(_docs(spark, sf_dir), "doc_id", max_hamming=8)


def q_winnow(spark, sf_dir):  # queries-only (rolling-hash kernel)
    out = textops.winnow_fingerprints(_docs(spark, sf_dir).select("doc_id", "text"))
    return out.select("doc_id", F.size("fingerprints").alias("n_fp"))


# ------------------------------------------------------------ multimodal
def _fake_media(spark, sf_dir):
    """Deterministic binary payloads keyed by doc_id (width/height are
    closed-form in doc_id, so DuckDB can oracle the decoded metadata)."""
    import pyspark.sql.types as T

    from .functions import multimodal

    docs = _docs(spark, sf_dir).select("doc_id")

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [
                multimodal.fake_image(32 + int(i) % 64, 32 + int(i) % 48)
                for i in pdf["doc_id"]
            ]
            yield pdf

    schema = T.StructType(
        [T.StructField("doc_id", T.LongType()), T.StructField("payload", T.BinaryType())]
    )
    return docs.mapInPandas(gen, schema=schema)


def q_multimodal_decode(spark, sf_dir):
    """Binary payload -> mapInPandas header decode -> typed metadata.
    The oracle recomputes the metadata closed-form from doc_id, so this
    checks the full Arrow round-trip (gen -> binary -> parse)."""
    from .functions import multimodal

    decoded = multimodal.decode_image_meta(_fake_media(spark, sf_dir))
    return decoded.select(
        "doc_id",
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.n_bytes").alias("n_bytes"),
    )


def q_frame_sample(spark, sf_dir):  # queries-only (1->N binary expansion)
    from .functions import multimodal

    media = _fake_media(spark, sf_dir).withColumnRenamed("doc_id", "media_id")
    frames = multimodal.frame_sample_stub(media, every_n=2)
    return (
        frames.groupBy("media_id")
        .agg(F.count("*").alias("n_frames"), F.sum(F.length("frame")).alias("frame_bytes"))
    )


# ------------------------------------------------------------ similarity
def _query_vec(spark, sf_dir) -> list[float]:
    row = _emb(spark, sf_dir).where(F.col("vec_id") == 0).select("embedding").first()
    return list(row.embedding)


def q_ann_brute_topk(spark, sf_dir):
    qv = _query_vec(spark, sf_dir)
    return similarity.brute_topk(
        _emb(spark, sf_dir), qv, k=10, exclude_id=0
    ).select("vec_id")


def q_ann_lsh_topk(spark, sf_dir):  # queries-only (numpy hyperplanes)
    qv = _query_vec(spark, sf_dir)
    return similarity.ann_topk_lsh(_emb(spark, sf_dir), qv, k=10, exclude_id=0).select(
        "vec_id"
    )


def q_ann_ivf_topk(spark, sf_dir):  # queries-only (trained quantizer)
    qv = _query_vec(spark, sf_dir)
    return similarity.ann_topk_ivf(_emb(spark, sf_dir), qv, k=10, exclude_id=0).select(
        "vec_id"
    )


def q_cosine_neardup(spark, sf_dir):
    return similarity.cosine_neardup_pairs_exact(
        _emb(spark, sf_dir), threshold_micro=400_000
    ).select("id_a", "id_b")


QUERIES = {
    "politeness_rank": q_politeness_rank,
    "schedule_round": q_schedule_round,
    "dedup_anti_join": q_dedup_anti_join,
    "priority_topk": q_priority_topk,
    "link_explode": q_link_explode,
    "link_truncate": q_link_truncate,
    "body_length_filter": q_body_length_filter,
    "rlike_filter": q_rlike_filter,
    "regex_field_extract": q_regex_field_extract,
    "per_source_agg": q_per_source_agg,
    "text_quality": q_text_quality,
    "fingerprint": q_fingerprint,
    "dedup_exact": q_dedup_exact,
    "dedup_ngram_jaccard": q_dedup_ngram_jaccard,
    "dedup_minhash_lsh": q_dedup_minhash_lsh,
    "simhash_pairs": q_simhash_pairs,
    "winnow_fingerprints": q_winnow,
    "ann_brute_topk": q_ann_brute_topk,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "cosine_neardup": q_cosine_neardup,
    "multimodal_decode": q_multimodal_decode,
    "frame_sample": q_frame_sample,
}

# =====================================================================
# DuckDB oracles (ANSI-ish SQL; tables pre-registered as views)
# =====================================================================

_SHINGLE_CTE = """
with toks as (select doc_id, string_split(text, ' ') as t from documents),
sh as (
  select distinct doc_id as doc, t[i] || ' ' || t[i+1] || ' ' || t[i+2] as shingle
  from toks, unnest(generate_series(1, len(t)-2)) as u(i)
  where len(t) >= 3
),
sz as (select doc, count(*) as sz from sh group by doc)
"""

_JACCARD_TAIL = """
inter as (
  select a.doc as doc_a, b.doc as doc_b, count(*) as inter
  from sh a join sh b using (shingle)
  where a.doc < b.doc
  group by 1, 2
)
select doc_a, doc_b,
       cast(floor(inter * 1000000.0 / (x.sz + y.sz - inter)) as bigint) as jac_micro
from inter
join sz x on x.doc = doc_a
join sz y on y.doc = doc_b
where floor(inter * 1000000.0 / (x.sz + y.sz - inter)) >= 500000
"""


def _minhash_lsh_oracle() -> str:
    n_hashes, n_bands, rpb = dedup.N_HASHES, dedup.N_BANDS, dedup.ROWS_PER_BAND

    def mh_expr(i: int) -> str:
        p, c = divmod(i, dedup.CHUNKS_PER_MD5)
        return (
            f"min(substr(md5('s{p}|' || shingle), {4 * c + 1}, 4)) as mh_{i}"
        )

    mh_cols = ",\n    ".join(mh_expr(i) for i in range(n_hashes))
    band_selects = "\n  union all\n".join(
        "  select doc, {b} as band, {cc} as bsig from sig".format(
            b=b,
            cc=" || '|' || ".join(
                f"mh_{b * rpb + r}" for r in range(rpb)
            ),
        )
        for b in range(n_bands)
    )
    return f"""{_SHINGLE_CTE},
sig as (
  select doc,
    {mh_cols}
  from sh group by doc
),
bands as (
{band_selects}
),
cand as (
  select distinct a.doc as doc_a, b.doc as doc_b
  from bands a join bands b using (band, bsig)
  where a.doc < b.doc
),
inter as (
  select doc_a, doc_b, count(*) as inter
  from cand
  join sh a on a.doc = cand.doc_a
  join sh b on b.doc = cand.doc_b and a.shingle = b.shingle
  group by 1, 2
)
select doc_a, doc_b,
       cast(floor(inter * 1000000.0 / (x.sz + y.sz - inter)) as bigint) as jac_micro
from inter
join sz x on x.doc = doc_a
join sz y on y.doc = doc_b
where floor(inter * 1000000.0 / (x.sz + y.sz - inter)) >= 500000
"""


_STOP_RE = textops.EN_STOP_RE.replace("\\", "\\")
_BPE_RE = textops.BPE_ISH_RE

ORACLES = {
    "politeness_rank": """
        select user_id, event_id, rn from (
          select user_id, event_id,
                 row_number() over (partition by user_id order by ts, event_id) as rn
          from events
        ) where rn <= 5
    """,
    "schedule_round": """
        select source, doc_id, rn from (
          select source, doc_id,
                 row_number() over (partition by source
                                    order by n_chars desc, doc_id asc) as rn
          from documents where doc_id % 7 <> 0
        ) where rn <= 3
    """,
    "dedup_anti_join": "select doc_id, source from documents where doc_id % 7 <> 0",
    "priority_topk": """
        select event_id from events
        order by value desc, ts asc, event_id asc limit 100
    """,
    "link_explode": """
        select token, count(*) as cnt
        from (select unnest(regexp_extract_all(text, '[a-z]+')) as token
              from documents)
        group by token order by cnt desc, token asc limit 20
    """,
    "link_truncate": """
        select doc_id,
               unnest(list_slice(regexp_extract_all(text, '[a-z]+'), 1, 3)) as token
        from documents
    """,
    "body_length_filter": """
        select doc_id, cast(length(text) as int) as body_len
        from documents where length(text) >= 800
    """,
    "rlike_filter": r"""
        select doc_id from documents
        where regexp_matches(text, '\bspark\b') and regexp_matches(text, '\bmerge\b')
    """,
    "regex_field_extract": r"""
        select doc_id, regexp_extract(text, 'value ([a-z]+)', 1) as next_word
        from documents
    """,
    "per_source_agg": """
        select source, count(*) as n_docs,
               cast(sum(n_chars) as bigint) as sum_chars,
               max(n_chars) as max_chars, min(n_chars) as min_chars
        from documents group by source
    """,
    "text_quality": rf"""
        with base as (
          select doc_id,
            cast(len(string_split_regex(text, '\s+')) as bigint) as n_tokens_ws,
            cast(len(regexp_extract_all(text, '{_BPE_RE}')) as bigint) as n_tokens_bpe,
            cast(len(regexp_extract_all(lower(text), '{_STOP_RE}', 1)) as bigint) as stop_hits,
            cast(length(text) as bigint) as n_chars_calc,
            cast(len(regexp_extract_all(text, '[.,!?;:]')) as bigint) as punct_hits
          from documents
        )
        select doc_id, n_tokens_ws, n_tokens_bpe,
          cast(case when n_tokens_ws > 0
               then floor(stop_hits * 1000000.0 / n_tokens_ws) else 0 end as bigint)
            as stop_ratio_micro,
          cast(case when n_chars_calc > 0
               then floor(punct_hits * 1000000.0 / n_chars_calc) else 0 end as bigint)
            as punct_ratio_micro,
          (n_tokens_ws >= 10 and n_chars_calc >= 50 and
           (case when n_tokens_ws > 0
                 then floor(stop_hits * 1000000.0 / n_tokens_ws) else 0 end) >= 10000)
            as keep,
          case when (case when n_tokens_ws > 0
                          then floor(stop_hits * 1000000.0 / n_tokens_ws)
                          else 0 end) >= 30000
               then 'en' else 'unk' end as lang_guess
        from base
    """,
    "fingerprint": r"""
        select doc_id,
               md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) as fp
        from documents
    """,
    "dedup_exact": r"""
        select doc_id, fp, (rn > 1) as is_dup from (
          select doc_id,
                 md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g'))) as fp,
                 row_number() over (
                   partition by md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
                   order by doc_id asc) as rn
          from documents
        )
    """,
    "dedup_ngram_jaccard": _SHINGLE_CTE + "," + _JACCARD_TAIL,
    "dedup_minhash_lsh": _minhash_lsh_oracle(),
    "ann_brute_topk": """
        select vec_id from embeddings
        where vec_id <> 0
        order by list_cosine_similarity(
          embedding, (select embedding from embeddings where vec_id = 0)) desc,
          vec_id asc
        limit 10
    """,
    "cosine_neardup": """
        select a.vec_id as id_a, b.vec_id as id_b
        from embeddings a join embeddings b on a.vec_id < b.vec_id
        where floor(list_cosine_similarity(a.embedding, b.embedding) * 1000000) >= 400000
    """,
    "multimodal_decode": """
        select doc_id,
               cast(32 + doc_id % 64 as int) as width,
               cast(32 + doc_id % 48 as int) as height,
               cast(16 + least(64, (32 + doc_id % 64) * (32 + doc_id % 48))
                    as bigint) as n_bytes
        from documents
    """,
    # simhash_pairs / winnow_fingerprints / ann_lsh_topk / frame_sample
    # intentionally have no oracle: xxhash64 / rolling-hash / numpy
    # hyperplanes / binary frame expansion are not reproducible in DuckDB
    # SQL -> driver records rows-only checks.
}
