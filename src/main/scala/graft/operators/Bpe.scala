package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}
import graft.functions.TextFunctions.tokens

/** Byte-pair-encoding vocabulary induction (r15) — the standard
  * LLM-pipeline tokenizer-training stage (Sennrich, Haddow & Birch,
  * "Neural Machine Translation of Rare Words with Subword Units",
  * ACL 2016): repeatedly count adjacent symbol pairs over the corpus
  * word frequencies and merge the most frequent pair into one symbol.
  *
  * Scale shape (the lda01 loop discipline): the CORPUS-scale work is
  * exactly one tokenize + one groupBy(word) count — after that every
  * round runs on the VOCABULARY-scale (word, n) table, each round ONE
  * partial-aggregated pair count whose winner (a single row) comes
  * back as bounded driver state and is applied to the segmentation as
  * a plan-literal string replace. Driver state is the merge list
  * itself — `merges` rows, never corpus- or vocabulary-sized.
  *
  * Cross-engine exactness: a word's segmentation is ONE STRING of
  * bracket-wrapped symbols ("low" → "(l)(o)(w)" with angle brackets),
  * so applying a merge is a plain string replace of "(l)(r)" by
  * "(lr)" — left-to-right non-overlapping in BOTH engines, and the
  * brackets make occurrence tests exact: a pair match always spans
  * two complete symbols, never the interior of one. Pair
  * counts are integer sums with (count DESC, lhs, rhs) lexicographic
  * tie-breaks, so the full merge table carries a FULL value oracle:
  * the DuckDB SQL unrolls the rounds as materialized CTEs (lp01's
  * pattern). Sentinels require '&lt;'/'&gt;'-free tokens — given on this
  * corpus ([a-z] only); a general deployment would map bytes first.
  * Both the trainer and [[encode]] ENFORCE that precondition in-plan
  * (r15 advisor): a token containing a bracket raises an error at the
  * vocabulary boundary instead of silently mis-segmenting — the check
  * rides the existing projection (no extra job, no hot-path regex).
  */
object Bpe {

  /** In-plan sentinel guard: `word` must not contain the '&lt;'/'&gt;'
    * bracket sentinels the segmentation strings are built from — a
    * bracketed token would let a pair replace span symbol boundaries
    * and corrupt the segmentation with no error. Evaluates to `word`
    * or raises. */
  private def guarded(word: Column): Column =
    when(contains(word, lit("<")) || contains(word, lit(">")),
      raise_error(concat(
        lit("BPE tokens must not contain '<' or '>' (map bytes first): "),
        word)).cast("string"))
      .otherwise(word)

  /** Merge rounds for [[t12]] — far below the corpus's ~100+ available
    * pair slots at every SF, so a winning pair always exists; shared
    * with the oracle SQL through the generator below. */
  val t12Merges = 32

  /** The learned merge table (step, lhs, rhs, cnt) over any
    * (doc_id, text) frame. */
  def bpeVocab(docs: DataFrame, merges: Int): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    var segs = docs
      .select(explode(tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(regexp_replace(guarded(col("w")), "(.)", "<$1>").as("seg"), col("n"))
      .localCheckpoint()
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, String, String, Long)]
    for (step <- 0 until merges) {
      // pair counting: stage the symbol array (the t10 inlining lesson),
      // explode adjacent pairs weighted by word count, ONE bounded
      // groupBy; the winner is deterministic by (cnt DESC, lhs, rhs)
      val win = segs
        .select(col("n"),
          split(regexp_replace(col("seg"), "^<|>$", ""), "><").as("sym"))
        .filter(size(col("sym")) >= 2)
        .select(col("n"),
          explode(transform(sequence(lit(0), size(col("sym")) - 2),
            i => struct(element_at(col("sym"), i + 1).as("l"),
              element_at(col("sym"), i + 2).as("r")))).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("n").as("cnt"))
        .orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      require(win.nonEmpty,
        s"BPE ran dry after $step merges — lower the merge count")
      val (l, r, cnt) =
        (win(0).getString(0), win(0).getString(1), win(0).getLong(2))
      out += ((step.toLong, l, r, cnt))
      segs = segs.select(
        replace(col("seg"), lit("<" + l + "><" + r + ">"),
          lit("<" + l + r + ">")).as("seg"),
        col("n"))
      // lineage cut every few rounds: the chain is one thin projection
      // per round over a vocabulary-sized table
      if ((step + 1) % 8 == 0) segs = segs.localCheckpoint()
    }
    out.toSeq.toDF("step", "lhs", "rhs", "cnt")
  }

  /** The SERVING side of [[bpeVocab]] — apply a learned merge list to
    * tokenize text (Sennrich et al.'s subword encoding): each word is
    * bracket-wrapped per character and the merges apply IN TRAINING
    * ORDER as chained left-to-right string replaces (identical
    * semantics to the trainer's own segmentation update), then the
    * bracket string splits back into subword tokens. Entirely map-only
    * — one codegen'd projection, zero shuffle — the 100 TB tokenization
    * shape; the merge list rides in the plan as literals. Each word
    * evaluates the whole chain once (the fold builds one nested
    * expression per array element — no multi-reference inlining).
    *
    * @return (doc_id, subwords: array&lt;string&gt;) */
  def encode(docs: DataFrame, merges: Seq[(String, String)]): DataFrame = {
    require(merges.forall { case (l, r) =>
      !(l + r).exists(c => c == '<' || c == '>') },
      "BPE merge symbols must not contain '<' or '>'")
    def segmented(word: org.apache.spark.sql.Column) =
      merges.foldLeft(regexp_replace(guarded(word), "(.)", "<$1>")) {
        case (acc, (l, r)) =>
          replace(acc, lit("<" + l + "><" + r + ">"), lit("<" + l + r + ">"))
      }
    docs
      .select(col("doc_id"), tokens(col("text")).as("w"))
      .select(col("doc_id"),
        flatten(transform(col("w"), word =>
          // an empty token (whitespace-only doc) yields NO subwords —
          // split("") would emit [""] where the char-map emits nothing
          when(word === "", typedlit(Seq.empty[String]))
            .otherwise(
              split(regexp_replace(segmented(word), "^<|>$", ""), "><"))))
          .as("subwords"))
  }

  /** The oracle replays every round: s_k = segmentations after k
    * merges, p_k = weighted pair counts, m_k = round k's winner; all
    * MATERIALIZED so the chain can't inline exponentially. */
  private def oracleSql(merges: Int): String = {
    val rounds = (0 until merges).map { k =>
      s"""p$k AS MATERIALIZED (
         |  SELECT sym[i] AS l, sym[i+1] AS r, CAST(sum(n) AS BIGINT) AS cnt
         |  FROM (SELECT string_split(trim(seg, '<>'), '><') AS sym, n FROM s$k),
         |       unnest(range(1, len(sym))) t(i)
         |  GROUP BY 1, 2),
         |m$k AS MATERIALIZED (
         |  SELECT l, r, cnt FROM p$k ORDER BY cnt DESC, l, r LIMIT 1),
         |s${k + 1} AS MATERIALIZED (
         |  SELECT replace(seg, '<' || m.l || '><' || m.r || '>',
         |                 '<' || m.l || m.r || '>') AS seg, n
         |  FROM s$k, m$k m)""".stripMargin
    }.mkString(",\n")
    val union = (0 until merges)
      .map(k => s"SELECT CAST($k AS BIGINT) AS step, l AS lhs, r AS rhs, cnt FROM m$k")
      .mkString("\nUNION ALL ")
    s"""WITH words AS MATERIALIZED (
       |  SELECT w, count(*) AS n FROM (
       |    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
       |    FROM documents)
       |  GROUP BY w),
       |s0 AS MATERIALIZED (
       |  SELECT regexp_replace(w, '(.)', '<\\1>', 'g') AS seg, n FROM words),
       |$rounds
       |SELECT * FROM ($union)
       |ORDER BY step""".stripMargin
  }

  /** Registered BPE pass: [[t12Merges]] merges over the documents
    * corpus, FULL value oracle (the merge table is deterministic
    * integer counting — the oracle SQL above is generated from the
    * same constant, so widths can never drift). */
  val t12 = Q.sql("t12_bpe_vocab", oracleSql(t12Merges)) { (s, dir) =>
    bpeVocab(Tables.documents(s, dir), t12Merges).orderBy("step")
  }

  val all: Seq[Q] = Seq(t12)
}
