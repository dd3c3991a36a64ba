package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text / hashing column functions for the LLM-data-pipeline operators
  * (SURVEY.md §2.4), built from Spark's codegen'd higher-order functions —
  * no UDFs, so every transform stays inside whole-stage codegen and
  * distributes trivially.
  *
  * All modular arithmetic stays below 2^52 so expressions are safe under
  * ANSI overflow checking (Spark 4 default).
  */
object TextFunctions {

  /** Mersenne prime 2^31-1: modulus for the hash families. */
  val P: Long = 2147483647L

  /** Let-binding for expressions: evaluates `v` once per row and passes
    * the result to `body` as a lambda variable. Without this, Catalyst's
    * CollapseProject inlines a derived column's *definition* at every use
    * site — an expression like a MinHash signature then re-derives its
    * gram array (and re-splits the text) per seed and per band, a
    * multiplicative blowup that took d03 from seconds to minutes. */
  def bind(v: Column)(body: Column => Column): Column =
    element_at(transform(array(v), body), 1)

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish subword pattern: letter runs, digit runs, single symbols. */
  val subwordPattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** Distinct word n-grams (shingles) of the token array. The token array
    * is let-bound so it is computed once, not once per element access. */
  def wordGrams(toks: Column, n: Int): Column =
    bind(toks) { ts =>
      when(size(ts) < n, array().cast("array<string>"))
        .otherwise(array_distinct(transform(
          sequence(lit(1), size(ts) - (n - 1)),
          i => concat_ws(" ", (0 until n).map(k => element_at(ts, i + lit(k))): _*))))
    }

  /** Non-negative base hash of a shingle into [0, P). */
  def baseHash(g: Column): Column = pmod(xxhash64(g), lit(P))

  /** MinHash signature: k independent affine hash functions
    * h_s(x) = (a_s·x + b_s) mod P, minimized over the shingle set.
    * a_s odd and < 2^8, so a_s·x + b_s < 2^40 — ANSI-safe. */
  def minhashSignature(grams: Column, k: Int): Column =
    bind(grams) { gs =>
      // pre-hash each gram once; the k affine functions then act on longs
      bind(transform(gs, g => baseHash(g))) { hs =>
        transform(sequence(lit(0), lit(k - 1)), s => {
          val a = s * 2 + lit(1)
          val b = pmod(s * lit(2654435761L % P), lit(P))
          when(size(hs) === 0, lit(P))
            .otherwise(array_min(transform(hs, h => pmod(a * h + b, lit(P)))))
        })
      }
    }

  /** MinHash signature from pre-hashed shingles (graft.plans.
    * HashedWordGrams): identical output to [[minhashSignature]] over the
    * corresponding gram strings, since baseHash(g) == pmod(xxhash64(g),P). */
  def minhashFromHashes(hashes: Column, k: Int): Column =
    bind(transform(hashes, h => pmod(h, lit(P)))) { hs =>
      transform(sequence(lit(0), lit(k - 1)), s => {
        val a = s * 2 + lit(1)
        val b = pmod(s * lit(2654435761L % P), lit(P))
        when(size(hs) === 0, lit(P))
          .otherwise(array_min(transform(hs, h => pmod(a * h + b, lit(P)))))
      })
    }

  /** Estimated Jaccard from two equal-length MinHash signatures. */
  def minhashJaccard(sigA: Column, sigB: Column, k: Int): Column =
    aggregate(
      zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, v) => acc + v).cast("double") / k

  /** LSH band keys: the signature split into `bands` rows-per-band groups,
    * each band hashed to one long — docs sharing any band are candidates. */
  def lshBands(sig: Column, bands: Int, rowsPerBand: Int): Column =
    bind(sig) { sg =>
      array((0 until bands).map(b =>
        xxhash64(concat_ws("_",
          lit(b).cast("string"),
          concat_ws(",", transform(
            slice(sg, b * rowsPerBand + 1, rowsPerBand), _.cast("string")))))): _*)
    }

  /** 63-bit SimHash per id over the token multiset: per bit j, sum ±1
    * across token hashes; the sign vector becomes the fingerprint.
    *
    * Shaped as explode + groupBy with 63 partial-aggregated sums (the
    * token hash computed once per token) rather than a higher-order-
    * function fold: an HOF formulation duplicates the whole vote
    * expression per output bit — a ~4000× expression blowup that falls
    * out of codegen. Rows whose token array is empty are dropped. */
  def simhash63Agg(df: org.apache.spark.sql.DataFrame, idCol: String, toks: Column): org.apache.spark.sql.DataFrame = {
    val votes = (0 until 63).map(j =>
      sum(when(shiftright(col("_h"), j).bitwiseAND(1) === 1, 1L).otherwise(-1L)).as(s"_v$j"))
    val assembled = (0 until 63).map(j =>
      when(col(s"_v$j") > 0, lit(1L << j)).otherwise(0L)).reduce(_ + _)
    df.select(col(idCol), explode(toks).as("_tok"))
      .withColumn("_h", xxhash64(col("_tok")))
      .groupBy(col(idCol))
      .agg(votes.head, votes.tail: _*)
      .select(col(idCol), assembled.as("simhash"))
  }

  /** Polynomial rolling fingerprint over the token sequence, mod P with a
    * small multiplier so products stay < 2^52 (ANSI-safe). Order-sensitive:
    * permuted documents get different fingerprints. */
  def rollingFingerprint(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, w) => pmod(acc * 1000003L + baseHash(w), lit(P)))

  /** [[rollingFingerprint]] variant whose word hash is itself a character
    * fold ((h·33 + codepoint) mod P — djb2 shape) instead of xxhash64, so
    * the WHOLE fingerprint is plain modular integer arithmetic any ANSI
    * engine reproduces bit-for-bit: this is what lets t04 carry a full
    * value oracle. Every product stays < 2^52 (ANSI-safe). Codepoint
    * caveat: `ascii` folds UTF-16 units, so fingerprints agree across
    * engines for BMP text (all of the corpus); astral-plane codepoints
    * would fold as surrogate halves here but whole codepoints elsewhere. */
  /** The djb2-shaped per-word char fold ((h·33 + codepoint) mod P) —
    * cross-engine reproducible (see [[crossEngineFingerprint]]); also the
    * hash behind ht01's hashing-TF feature index. */
  def wordFold(w: Column): Column =
    aggregate(split(w, ""), lit(0L), (a, c) => pmod(a * 33 + ascii(c), lit(P)))

  def crossEngineFingerprint(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, w) => pmod(acc * 1000003L + wordFold(w), lit(P)))

  /** Exact cosine similarity: float multiplies (parquet element type),
    * double left-fold accumulation — bit-identical to the DuckDB oracle's
    * list_sum(list_transform(...)) form. */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }
}
