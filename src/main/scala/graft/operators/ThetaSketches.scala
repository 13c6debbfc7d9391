package graft.operators

import scala.collection.mutable

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{SetOperation, Sketch, Sketches,
  UpdateSketch}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Theta-sketch set operations over corpus terms — the capability HLL
  * cannot give: DISTINCT INTERSECTIONS. "How many distinct terms do
  * sources A and B share" exactly (source_overlap's digest join) costs
  * a term-keyed corpus shuffle per question; theta sketches answer any
  * pairwise (or k-way) set question from per-source sketches that are
  * KBs each and BUILT WITH NO TERM-KEYED SHUFFLE AT ALL:
  *
  *   scan → per-partition partial sketches (bounded memory, ≤ k
  *   entries each) → per-source union (the shuffle moves
  *   partitions × sources SKETCHES, never terms) → driver-side
  *   pairwise intersections over the sources-sized sketch list.
  *
  * This is the manual map-side combine that makes the plan scale: at
  * 100 TB the only corpus-sized work is the scan. Estimates are
  * DETERMINISTIC (DataSketches' default update seed is fixed) and
  * EXACT while sketches hold fewer than k distinct entries — the
  * regime the oracle exercises; the estimation-regime error envelope
  * and partial-union ≡ direct-build are SketchSpec's gates.
  */
object ThetaSketches {

  /** Per-source compact theta sketches of the distinct-term sets.
    * Input must carry (source, term); output is sources-sized
    * (source, sketch bytes).
    */
  def sourceTermSketches(terms: DataFrame,
      lgK: Int = 12): Dataset[(String, Array[Byte])] = {
    val spark = terms.sparkSession
    import spark.implicits._
    terms.select(col("source").cast("string"), col("term").cast("string"))
      .as[(String, String)]
      .mapPartitions { it =>
        // Partial sketches: one UpdateSketch per source seen in this
        // partition — memory ≤ sources × k entries, independent of
        // partition row count.
        val partials = mutable.Map.empty[String, UpdateSketch]
        it.foreach { case (src, t) =>
          partials.getOrElseUpdate(src,
            UpdateSketch.builder().setLogNominalEntries(lgK).build())
            .update(t): Unit
        }
        partials.iterator.map { case (s, sk) =>
          (s, sk.compact().toByteArray)
        }
      }
      .groupByKey(_._1)
      .mapGroups { (src, it) =>
        // Sketch-sized reduce: unions over ≤ nPartitions compact
        // sketches per source.
        val u = SetOperation.builder().setLogNominalEntries(lgK)
          .buildUnion()
        it.foreach { case (_, b) => u.union(heapify(b)) }
        (src, u.getResult.toByteArray)
      }
  }

  /** Pairwise distinct-intersection estimates from per-source
    * sketches: driver-side over the sources-sized list (governance
    * scale, the codebook-loop pattern — sources², not terms²).
    * Returns (src_a, src_b, shared_terms) for src_a < src_b.
    */
  def pairwiseIntersections(
      sketches: Seq[(String, Array[Byte])]): Seq[(String, String, Long)] = {
    val sorted = sketches.sortBy(_._1)
    for {
      (a, ab) <- sorted
      (b, bb) <- sorted if a < b
    } yield {
      val i = SetOperation.builder().buildIntersection()
      i.intersect(heapify(ab))
      i.intersect(heapify(bb))
      (a, b, math.round(i.getResult.getEstimate))
    }
  }

  /** End-to-end: per-source sketches → pairwise intersection table.
    * One corpus scan, sketch-sized everything after.
    */
  def sourceOverlapEstimates(terms: DataFrame,
      lgK: Int = 12): DataFrame = {
    val spark = terms.sparkSession
    import spark.implicits._
    val sketches = sourceTermSketches(terms, lgK).collect().toSeq
    pairwiseIntersections(sketches)
      .toDF("src_a", "src_b", "shared_terms")
  }

  /** Union a list of serialized sketches into one compact sketch —
    * the per-source epoch-sidecar merge (TermStatsStore): KB inputs,
    * driver-side, order-independent.
    */
  def unionAll(sketches: Seq[Array[Byte]], lgK: Int = 12): Array[Byte] = {
    val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
    sketches.foreach(b => u.union(heapify(b)))
    u.getResult.toByteArray
  }

  private def heapify(b: Array[Byte]): Sketch =
    Sketches.heapifySketch(Memory.wrap(b))
}
