package graft.operators

import graft.functions.TextFunctions.shaHash32
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-min sketch — the bounded-memory frequency summary for token /
  * URL / n-gram streams (Cormode & Muthukrishnan, J.Alg 2005): `depth`
  * independent hash rows of `width` counters; an item's estimate is the
  * MIN over its `depth` cells, which never underestimates and
  * overestimates by at most εn with probability 1−δ (ε = e/width,
  * δ = e^−depth).
  *
  * Where [[Stats.heavyHitters]] (Misra–Gries) answers "which values are
  * frequent", the CMS answers point queries — "how often did THIS value
  * occur" — for values chosen after the pass, without keeping the
  * full exact histogram that q_vocab's groupBy materializes.
  *
  * Scale shape: the build is ONE partial-aggregated groupBy over
  * depth·n (row, cell) pairs — map-side combine collapses each
  * partition to at most depth·width rows before the shuffle, so the
  * exchanged volume is bounded by the sketch size (depth·width
  * counters), not the corpus. Estimates join probes against the
  * sketch on (row, cell) — the sketch side is tiny and broadcasts.
  *
  * Hashes are sha256-derived ([[graft.functions.TextFunctions
  * .shaHash32]] over a "row:value" key), so any engine — the DuckDB
  * gate included — replays every cell assignment bit-for-bit; there is
  * no seed state to ship to 1000 executors.
  */
object Sketches {
  /** Cell index of `v` in hash row `row`: shaHash32("row:v") mod width
    * (the 32-bit hash is non-negative, so `%` is a true mod in both
    * Spark and any ANSI oracle). */
  def cmsCell(v: Column, row: Int, width: Int): Column =
    shaHash32(concat(lit(s"$row:"), v)) % width

  /** Build the sketch over `valCol` (nulls excluded): one row per
    * OCCUPIED (row, cell) with its BIGINT count — empty cells are
    * implicit zeros, so the result is at most depth·width rows no
    * matter the corpus size. */
  def cmsBuild(df: DataFrame, valCol: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"need depth>=1, width>=1; got $depth/$width")
    val cells = array((0 until depth).map { j =>
      struct(lit(j).as("row"), cmsCell(col(valCol), j, width).as("cell"))
    }: _*)
    df.filter(col(valCol).isNotNull)
      .select(explode(cells).as("rc"))
      .groupBy(col("rc.row").as("row"), col("rc.cell").as("cell"))
      .agg(count(lit(1)).as("n"))
  }

  /** Bits per bitmap word. 63 (not 64) so the highest in-word shift is
    * 62 and every mask stays a POSITIVE int64 — `1 << 63` is the sign
    * bit, which ANSI engines (the DuckDB oracle included) reject as a
    * left-shift overflow. One wasted bit per word buys an arithmetic
    * form every engine replays identically. */
  val BloomWordBits = 63

  /** Bit position of `v` in a Bloom filter of `mBits` bits for hash row
    * `j`: shaHash32("bloom:j:v") mod mBits (non-negative, so `%` is a
    * true mod in both Spark and any ANSI oracle). */
  def bloomBit(v: Column, j: Int, mBits: Int): Column =
    shaHash32(concat(lit(s"bloom:$j:"), v)) % mBits

  private def bloomWords(df: DataFrame, valCol: String, mBits: Int, k: Int) = {
    val pos = array((0 until k).map(j => bloomBit(col(valCol), j, mBits)): _*)
    df.filter(col(valCol).isNotNull)
      .select(col(valCol), explode(pos).as("p"))
      .select(col(valCol),
        (col("p") / BloomWordBits).cast("long").as("word"),
        // shiftleft's Scala binding takes a literal shift; the SQL form
        // accepts the column
        expr(s"shiftleft(CAST(1 AS BIGINT), CAST(p % $BloomWordBits AS INT))")
          .as("mask"))
  }

  /** Build a Bloom filter over `valCol` (nulls excluded): `k` sha-derived
    * bit positions per value in an `mBits`-bit space, materialized as one
    * row per OCCUPIED 63-bit word — `(word, bits)` with bits the OR of
    * the word's set masks. The membership summary for seen-URL /
    * blocklist checks where q_contam's shingle inventory would be
    * overkill: no false negatives ever; false positives at rate
    * ≈ (1 − e^(−kn/m))^k, tunable by m and k.
    *
    * Scale shape: the shuffle is bounded by the BITMAP size, not the
    * corpus — map-side combine collapses each partition to at most
    * ⌈mBits/63⌉ word rows before the exchange, and the result never
    * exceeds that no matter how many values stream through. Hashes are
    * sha256-derived, so a DuckDB gate (or a fleet of 1000 executors)
    * reproduces every bit without shipping seed state. */
  def bloomBuild(df: DataFrame, valCol: String, mBits: Int, k: Int): DataFrame = {
    require(mBits >= BloomWordBits, s"need mBits >= $BloomWordBits; got $mBits")
    require(k >= 1, s"need k >= 1; got $k")
    bloomWords(df, valCol, mBits, k)
      .groupBy("word").agg(bit_or(col("mask")).as("bits"))
  }

  /** Membership probe against a [[bloomBuild]] bitmap (SAME mBits/k):
    * `might_contain` is true iff ALL `k` bits are set. The bitmap is at
    * most ⌈mBits/63⌉ rows and explicitly broadcast, so probing is a
    * map-side join plus one partial-aggregated fold — the probe stream
    * itself never shuffles on anything but its own group key. */
  def bloomMightContain(probes: DataFrame, probeCol: String, bloom: DataFrame,
                        mBits: Int, k: Int): DataFrame =
    bloomWords(probes, probeCol, mBits, k)
      .join(broadcast(bloom), Seq("word"), "left")
      .groupBy(col(probeCol))
      // a probe has exactly k (word, mask) rows; a missed word is all-zero
      .agg(min(when(coalesce(col("bits"), lit(0L))
        .bitwiseAND(col("mask")) =!= 0, 1L).otherwise(0L)).as("__allset"))
      .select(col(probeCol), (col("__allset") === 1L).as("might_contain"))

  /** HyperLogLog bucket count exponent → m = 2^b buckets. */
  private def hllM(b: Int): Int = 1 << b

  /** (bucket, rho) of `v` under the sha-derived 32-bit hash: bucket =
    * h mod 2^b, rho = 1 + leading zeros of the remaining (32−b)-bit
    * value (Flajolet et al. 2007). floor(log2(rest)) is taken as
    * `length(bin(rest)) − 1` — a STRING length, exact on any engine,
    * where a float log2 would sit on representation boundaries. */
  def hllParts(v: Column, b: Int): (Column, Column) = {
    val m = hllM(b)
    val h = shaHash32(concat(lit("hll:"), v))
    val rest = shiftright(h, b) // h div 2^b: h is non-negative 32-bit
    val bucket = h % m
    val rho = when(rest === 0, lit(32 - b + 1).cast("long"))
      .otherwise(lit(32 - b) - (length(bin(rest)) - 1))
    (bucket, rho)
  }

  /** Per-group HyperLogLog REGISTER table over `valCol`: one row per
    * occupied (group, bucket) with r = max rho — at most 2^b rows per
    * group regardless of corpus size. The registers are the mergeable,
    * engine-portable core of HLL (max is associative; sha hashes replay
    * anywhere), so the register table itself carries the hash gate;
    * [[hllEstimate]] is the float read-out twin. Scale shape: ONE
    * partial-aggregated groupBy — map-side combine collapses each
    * partition to ≤ groups·2^b rows before the shuffle, the same
    * bounded-exchange argument as [[cmsBuild]]/[[bloomBuild]]. */
  def hllRegisters(df: DataFrame, groupCol: String, valCol: String,
                   b: Int): DataFrame = {
    require(b >= 4 && b <= 16, s"need 4 <= b <= 16; got $b")
    val (bucket, rho) = hllParts(col(valCol).cast("string"), b)
    df.filter(col(valCol).isNotNull)
      .groupBy(col(groupCol), bucket.as("bucket"))
      .agg(max(rho).as("r"))
  }

  /** Cardinality estimate per group from a [[hllRegisters]] table
    * (same b): the HLL read-out with the small-range linear-counting
    * correction (empty registers count as 2^0; E ≤ 2.5m and V > 0 →
    * m·ln(m/V)). Deployable twin — float math stays OUT of the gate
    * row; SketchesSpec pins it to the exact distinct within tolerance. */
  def hllEstimate(registers: DataFrame, groupCol: String, b: Int): DataFrame = {
    val m = hllM(b)
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    registers.groupBy(col(groupCol))
      .agg(count(lit(1)).as("__occ"), sum(pow(lit(0.5), col("r"))).as("__sp"))
      .select(col(groupCol),
        (lit(m) - col("__occ")).as("__v"),
        (lit(alpha * m.toDouble * m) / (col("__sp") + (lit(m) - col("__occ"))))
          .as("__e"))
      .select(col(groupCol),
        when(col("__e") <= 2.5 * m && col("__v") > 0,
          lit(m.toDouble) * log(lit(m.toDouble) / col("__v")))
          .otherwise(col("__e")).as("est"))
  }

  /** Densify a [[bloomBuild]] bitmap into the full word array (absent
    * words are zero) — a BOUNDED driver read: ⌈mBits/63⌉ longs (e.g.
    * 64 longs for a 4032-bit filter), never data-sized. This is the
    * step that turns the distributed build into a SCAN-STAGE literal. */
  def bloomBitmapWords(bloom: DataFrame, mBits: Int): Seq[Long] = {
    val n = (mBits + BloomWordBits - 1) / BloomWordBits
    val words = new Array[Long](n)
    // bounded collect: at most n rows by construction of bloomBuild
    bloom.collect().foreach(r => words(r.getLong(0).toInt) = r.getLong(1))
    words.toSeq
  }

  /** Membership test as a PURE scan-stage expression over a literal
    * bitmap (from [[bloomBitmapWords]], SAME mBits/k): all k bits set.
    * This is the deployable join-pruning shape — the filter rides the
    * parquet scan via whole-stage codegen and drops the (1−fp)·miss
    * fraction of a 100 TB probe side before ANY exchange; the exact
    * join afterwards removes the false positives, so composing
    * prefilter + join is result-identical to the plain join (no false
    * negatives ever). */
  def bloomLiteralMightContain(words: Seq[Long], v: Column,
                               mBits: Int, k: Int): Column = {
    require(words.nonEmpty && k >= 1, s"need words, k >= 1; got $k")
    val arr = array(words.map(lit): _*)
    (0 until k).map { j =>
      val p = bloomBit(v, j, mBits)
      val mask = call_function("shiftleft", lit(1L),
        (p % BloomWordBits).cast("int"))
      (element_at(arr, (p / BloomWordBits).cast("int") + 1)
        .bitwiseAND(mask) =!= 0)
    }.reduce(_ && _)
  }

  /** EXACT segment bitmaps over a dense non-negative id space: one row
    * per occupied (segment, word) with the 63-bit membership word —
    * the roaring-bitmap-style audience index. Build is ONE partial-
    * aggregated bit_or groupBy: map-side combine collapses each
    * partition to ≤ segments·⌈idMax/63⌉ rows, and the bitmap is
    * ~n_ids/63 of the id-list size — which is what makes set algebra
    * over billion-user segments a words-join, not a distinct-join. */
  def segmentBitmaps(df: DataFrame, segCol: String, idCol: String): DataFrame =
    df.filter(col(idCol).isNotNull && col(idCol) >= 0)
      .select(col(segCol).as("seg"),
        (col(idCol).cast("long") / BloomWordBits).cast("long").as("word"),
        call_function("shiftleft", lit(1L),
          (col(idCol).cast("long") % BloomWordBits).cast("int")).as("mask"))
      .groupBy("seg", "word")
      .agg(bit_or(col("mask")).as("bits"))

  /** Pairwise segment overlap from [[segmentBitmaps]]: |A ∩ B| for every
    * segment pair as Σ bit_count(bitsA & bitsB) over shared words — an
    * equi-join on `word` (only same-word rows shuffle together) + one
    * partial-agg fold; per-pair cost is the SHARED word count, never
    * |A|·|B|. Pairs with no common member are omitted. */
  def segmentOverlap(bitmaps: DataFrame): DataFrame =
    bitmaps.alias("a")
      .join(bitmaps.alias("b"),
        col("a.word") === col("b.word") && col("a.seg") < col("b.seg"))
      .groupBy(col("a.seg").as("seg_a"), col("b.seg").as("seg_b"))
      .agg(sum(bit_count(col("a.bits").bitwiseAND(col("b.bits"))))
        .cast("long").as("n_common"))
      .filter(col("n_common") > 0)

  /** Point-query estimates for `probes` (a column `probeCol` of values):
    * est = min over hash rows of the matching cell count, 0 when a cell
    * was never touched. `sketch` must come from [[cmsBuild]] with the
    * SAME depth/width. The sketch is at most depth·width rows, so the
    * join side is explicitly broadcast — probing never shuffles the
    * probe set. */
  def cmsEstimate(probes: DataFrame, probeCol: String, sketch: DataFrame,
                  depth: Int, width: Int): DataFrame = {
    val cells = array((0 until depth).map { j =>
      struct(lit(j).as("row"), cmsCell(col(probeCol), j, width).as("cell"))
    }: _*)
    probes.filter(col(probeCol).isNotNull)
      .select(col(probeCol), explode(cells).as("rc"))
      .join(broadcast(sketch),
        col("rc.row") === sketch("row") && col("rc.cell") === sketch("cell"),
        "left")
      .groupBy(col(probeCol))
      // every probe has exactly `depth` rows; a missed cell is count 0
      .agg(min(coalesce(col("n"), lit(0L))).as("est"))
  }
}
