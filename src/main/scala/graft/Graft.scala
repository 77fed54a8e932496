package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, IntegerLiteral}
import org.apache.spark.sql.graft.shims

import graft.functions.{WinnowFingerprints, WordNgrams, WordSetHits}
import graft.hash.Fnv1a32
import graft.sim.Dot64
import graft.sketch.{BloomBits, CmsCounts, KmvDistinct, KmvMins}

/** SQL surface for the engine's custom expressions, so `spark.sql` users
  * get them alongside the Column API:
  *
  *   - `fnv1a32(str)`          → BIGINT hash in [0, 2^32)
  *   - `char_class_counts(str)` → ARRAY<BIGINT> [alpha, digit, space]
  *     one-pass byte-loop class counts
  *   - `dot64(arr, arr)`       → DOUBLE ordered-fold dot product
  *   - `word_ngrams(arr, n)`   → distinct n-gram shingles (n literal)
  *   - `word_set_hits(arr, 'w1,w2,…')` → tokens hitting the probe set
  *     (comma-joined string literal — the language-ID kernel)
  *   - `winnow(str, k, w)`     → winnowing fingerprints (k, w literals)
  *   - `kmv_distinct(hash, k)` → DOUBLE distinct estimate (aggregate;
  *     feed it `fnv1a32(item)`)
  *   - `kmv_mins(hash, k)`     → ARRAY<BIGINT> sketch state (aggregate)
  *     for set algebra over stored sketches
  *   - `cms_counts(str, d, w)` → count-min counters (aggregate)
  *   - `bloom_bits(str, m, k)` → Bloom filter words (aggregate)
  *   - `bit_length64(long)`    → INT binary bit length (0 → 0; the HLL
  *     rank / power-of-two bucket primitive)
  *
  * Register per-session with [[Graft.register]], or session-wide via
  * `spark.sql.extensions=graft.GraftExtensions`.
  */
object Graft {

  private[graft] val functions: Seq[(String, Seq[Expression] => Expression)] =
    Seq(
      "fnv1a32" -> { es =>
        es match {
          case Seq(e) => Fnv1a32(e)
          case other => throw new IllegalArgumentException(
            s"fnv1a32(str) takes 1 argument, got ${other.size}")
        }
      },
      "dot64" -> { es =>
        es match {
          case Seq(a, b) => Dot64(a, b)
          case other => throw new IllegalArgumentException(
            s"dot64(arr, arr) takes 2 arguments, got ${other.size}")
        }
      },
      "char_class_counts" -> { es =>
        es match {
          case Seq(e) => graft.functions.CharClassCounts(e)
          case other => throw new IllegalArgumentException(
            s"char_class_counts(str) takes 1 argument, got ${other.size}")
        }
      },
      "common_prefix_len" -> { es =>
        es match {
          case Seq(a, b) => graft.functions.CommonPrefixLen(a, b)
          case other => throw new IllegalArgumentException(
            s"common_prefix_len(str, str) takes 2 arguments, got ${other.size}")
        }
      },
      "word_ngrams" -> { es =>
        es match {
          case Seq(toks, IntegerLiteral(n)) => WordNgrams(toks, n)
          case other => throw new IllegalArgumentException(
            s"word_ngrams(tokens, n) takes 2 arguments with n an integer literal, got $other")
        }
      },
      "word_ngrams_all" -> { es =>
        es match {
          case Seq(toks, IntegerLiteral(n)) =>
            WordNgrams(toks, n, distinct = false)
          case other => throw new IllegalArgumentException(
            s"word_ngrams_all(tokens, n) takes 2 arguments with n an integer literal, got $other")
        }
      },
      "word_set_hits" -> { es =>
        es match {
          case Seq(toks, org.apache.spark.sql.catalyst.expressions.Literal(
              csv: org.apache.spark.unsafe.types.UTF8String, _)) =>
            // trim + drop empties: 'the, a' must probe "a", not " a",
            // and '' must be rejected, not count empty-string tokens
            val words = csv.toString.split(",").toSeq
              .map(_.trim).filter(_.nonEmpty)
            require(words.nonEmpty,
              "word_set_hits probe set must contain at least one word")
            WordSetHits(toks, words)
          case other => throw new IllegalArgumentException(
            s"word_set_hits(tokens, 'w1,w2,…') takes 2 arguments with a string literal probe set, got $other")
        }
      },
      "winnow" -> { es =>
        es match {
          case Seq(text, IntegerLiteral(k), IntegerLiteral(w)) =>
            WinnowFingerprints(text, k, w)
          case other => throw new IllegalArgumentException(
            s"winnow(text, k, w) takes 3 arguments with k, w integer literals, got $other")
        }
      },
      // the sketch aggregates: the analyzer wraps a bare AggregateFunction
      // in an AggregateExpression, same as the built-in sum/count builders
      "kmv_distinct" -> { es =>
        es match {
          case Seq(item, IntegerLiteral(k)) => KmvDistinct(item, k)
          case other => throw new IllegalArgumentException(
            s"kmv_distinct(item, k) takes 2 arguments with k an integer literal, got $other")
        }
      },
      "kmv_mins" -> { es =>
        es match {
          case Seq(item, IntegerLiteral(k)) => KmvMins(item, k)
          case other => throw new IllegalArgumentException(
            s"kmv_mins(item, k) takes 2 arguments with k an integer literal, got $other")
        }
      },
      "cms_counts" -> { es =>
        es match {
          case Seq(item, IntegerLiteral(d), IntegerLiteral(w)) =>
            CmsCounts(item, d, w)
          case other => throw new IllegalArgumentException(
            s"cms_counts(item, depth, width) takes 3 arguments with depth, width integer literals, got $other")
        }
      },
      "bloom_bits" -> { es =>
        es match {
          case Seq(item, IntegerLiteral(m), IntegerLiteral(k)) =>
            BloomBits(item, m, k)
          case other => throw new IllegalArgumentException(
            s"bloom_bits(item, mBits, kHashes) takes 3 arguments with mBits, kHashes integer literals, got $other")
        }
      },
      "bit_length64" -> { es =>
        es match {
          case Seq(e) => graft.functions.BitLength(e)
          case other => throw new IllegalArgumentException(
            s"bit_length64(long) takes 1 argument, got ${other.size}")
        }
      })

  def register(spark: SparkSession): Unit = {
    val reg = shims.functionRegistry(spark)
    functions.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }
}

/** `--conf spark.sql.extensions=graft.GraftExtensions` (or
  * `SparkSession.builder().withExtensions(new GraftExtensions)`). */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit =
    Graft.functions.foreach { case (name, builder) =>
      e.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
}
