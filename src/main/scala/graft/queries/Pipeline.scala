package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.core.Tables
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Beyond-reference LLM-pipeline operators (BASELINE.json north star):
  * deduplication, similarity search, text analysis, multimodal plumbing
  * over `documents` / `embeddings`. SQL-expressible signals carry a DuckDB
  * oracle; LSH/minhash/ANN entries are rows-only checked by the driver and
  * covered by ScalaTest specs with constructed fixtures instead.
  */
object Pipeline {

  private def t(s: SparkSession, dir: String, n: String) = Tables.load(s, dir, n)

  val all: Seq[Q] = Seq(

    // ---- Exact dedup: survivor = min doc_id per identical text.
    Q("d01_dedup_exact",
      (s, dir) => t(s, dir, "documents")
        .groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_cnt"))
        .select(col("doc_id"), col("dup_cnt")),
      Some("""
        SELECT MIN(doc_id) AS doc_id, COUNT(*) AS dup_cnt
        FROM documents GROUP BY text""")),

    // ---- MinHash+LSH near-dup candidate pairs with exact Jaccard verify.
    Q("d02_minhash_pairs",
      (s, dir) => Dedup.minhashCandidates(
        t(s, dir, "documents"), "doc_id", "text",
        Dedup.MinHashConfig(numHashes = 64, bands = 16, threshold = 0.35)),
      None),

    // ---- MinHash dedup survivors (keep-earliest).
    Q("d03_minhash_dedup",
      (s, dir) => Dedup.minhashDedup(
          t(s, dir, "documents"), "doc_id", "text",
          Dedup.MinHashConfig(numHashes = 64, bands = 16, threshold = 0.35))
        .select(col("doc_id"), col("lang"), col("source"), col("n_chars")),
      None),

    // ---- Transitive MinHash dedup: connected components over the near-dup
    // graph (label propagation; one min-id survivor per component).
    Q("d07_minhash_dedup_transitive",
      (s, dir) => Dedup.minhashDedupTransitive(
          t(s, dir, "documents"), "doc_id", "text",
          Dedup.MinHashConfig(numHashes = 64, bands = 16, threshold = 0.35))
        .select(col("doc_id"), col("lang"), col("source")),
      None),

    // ---- SimHash near-dup pairs (custom Catalyst expression + banding).
    Q("d04_simhash_pairs",
      (s, dir) => Dedup.simhashCandidates(
        t(s, dir, "documents"), "doc_id", "text", maxHamming = 16),
      None),

    // ---- Exact word-3-gram Jaccard over LSH candidates.
    Q("d05_ngram_jaccard",
      (s, dir) => Dedup.ngramJaccardPairs(
        t(s, dir, "documents"), "doc_id", "text", n = 3, threshold = 0.1,
        Dedup.MinHashConfig(numHashes = 64, bands = 16, threshold = 0.0)),
      None),

    // ---- Embedding near-dup pairs via hyperplane LSH + cosine verify.
    Q("d06_embedding_neardup",
      (s, dir) => Similarity.embeddingNearDupPairs(
        t(s, dir, "embeddings"), "vec_id", "embedding",
        threshold = 0.35, dim = 64, bitsPerTable = 6, tables = 8),
      None),

    // ---- ANN: exact brute-force cosine top-k (baseline; corpus-linear).
    Q("s01_ann_bruteforce",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.bruteForceTopK(
          emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 10)
      },
      None),

    // ---- ANN: hyperplane-LSH bucketed top-k (scale path; sublinear).
    Q("s02_ann_lsh",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.lshTopK(
          emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 10, dim = 64, bitsPerTable = 5, tables = 8)
      },
      None),

    // ---- ANN: IVF-flat (k-means cells + probe; third ANN strategy).
    Q("s03_ann_ivf",
      (s, dir) => {
        val emb = t(s, dir, "embeddings")
        Similarity.ivfTopK(
          emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 8), "vec_id", "embedding",
          k = 10, nCentroids = 16, nProbe = 4)
      },
      None),

    // ---- Text stats with DuckDB oracle (token counts, char-class ratios,
    // quality flag — the SQL-expressible subset of TextAnalysis.analyze).
    Q("t01_text_stats",
      (s, dir) => {
        val d = t(s, dir, "documents")
        d.select(Seq(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("token_count")) ++
          TextAnalysis.qualitySignals(col("text")): _*)
      },
      Some("""
        WITH q AS (
          SELECT doc_id,
                 text,
                 LENGTH(text) AS nc,
                 LENGTH(REGEXP_REPLACE(text, '[^a-zA-Z]', '', 'g')) AS alpha,
                 LENGTH(REGEXP_REPLACE(text, '[^0-9]', '', 'g')) AS digits,
                 LENGTH(REGEXP_REPLACE(text, '[^ ]', '', 'g')) AS spaces,
                 LIST_FILTER(STRING_SPLIT(TRIM(REGEXP_REPLACE(LOWER(text), '\s+', ' ', 'g')), ' '),
                             x -> LENGTH(x) > 0) AS toks
          FROM documents)
        SELECT doc_id,
               CAST(LEN(toks) AS BIGINT) AS token_count,
               CAST(nc AS BIGINT) AS n_chars_m,
               CAST(LEN(toks) AS BIGINT) AS n_tokens,
               CASE WHEN nc > 0 THEN CAST(alpha AS DOUBLE) / nc ELSE 0.0 END AS alpha_ratio,
               CASE WHEN nc > 0 THEN CAST(digits AS DOUBLE) / nc ELSE 0.0 END AS digit_ratio,
               CAST(spaces AS DOUBLE) / GREATEST(nc, 1) AS space_ratio,
               CASE WHEN LEN(toks) > 0
                    THEN CAST(LIST_SUM(LIST_TRANSFORM(toks, x -> LENGTH(x))) AS DOUBLE) / LEN(toks)
                    ELSE 0.0 END AS mean_token_len,
               (nc >= 20 AND LEN(toks) >= 5
                AND CASE WHEN nc > 0 THEN CAST(alpha AS DOUBLE) / nc ELSE 0.0 END > 0.5
                AND CASE WHEN nc > 0 THEN CAST(digits AS DOUBLE) / nc ELSE 0.0 END < 0.3)
                 AS quality_keep
        FROM q""")),

    // ---- Language ID (stopword-evidence heuristic; deterministic).
    Q("t02_lang_id",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.langId(col("text")).as("pred_lang")),
      None),

    // ---- Winnowing fingerprint (size + content hash of the set).
    Q("t03_fingerprint",
      (s, dir) => t(s, dir, "documents")
        .select(col("doc_id"),
          array_sort(TextAnalysis.fingerprint(col("text"))).as("__fp"))
        .select(col("doc_id"),
          size(col("__fp")).cast("long").as("fp_size"),
          xxhash64(concat_ws(",",
            transform(col("__fp"), h => h.cast("string")))).as("fp_hash")),
      None),

    // ---- Multimodal: stub-decode metadata over a binary payload column.
    Q("m01_media_decode",
      (s, dir) => Multimodal.decodeMeta(
        Multimodal.syntheticMedia(t(s, dir, "documents"))),
      None),

    // ---- Multimodal: frame sampling (row explosion per sampled frame).
    Q("m02_frame_sample",
      (s, dir) => Multimodal.sampleFrames(
        Multimodal.decodeMeta(Multimodal.syntheticMedia(t(s, dir, "documents"))),
        everyNth = 30),
      None),

    // ---- Multimodal: feature extraction + resize stages (stub codec, real
    // batch plumbing) — fp_mean surfaced so the rows-only check sees shape.
    Q("m03_media_features",
      (s, dir) => {
        val media = Multimodal.syntheticMedia(t(s, dir, "documents"))
        val feats = Multimodal.extractFeatures(media, dim = 16)
        val resized = Multimodal.resizeMeta(Multimodal.decodeMeta(media), maxEdge = 512)
        resized.join(feats, Seq("media_id"))
          .select(col("media_id"), col("kind"), col("out_width"), col("out_height"),
            size(col("feature")).as("feat_dim"))
      },
      None)
  )
}
