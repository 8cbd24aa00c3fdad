package graft.functions

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.scalatest.funsuite.AnyFunSuite

import graft.store.Metrics

import scala.util.Random

/** Property loops cross-checking the codegen-shared kernels against
  * independent formulations (seeded, no Spark session needed). */
class KernelPropertiesSpec extends AnyFunSuite {

  private def randVec(rng: Random, dim: Int): Array[Float] =
    Array.fill(dim)(rng.nextGaussian().toFloat)

  private def arrayData(v: Array[Float]) = new GenericArrayData(v)

  test("IvfKernels.nearest equals linear argmin under every metric") {
    val rng = new Random(7)
    val cents = Array.fill(16)(randVec(rng, 64))
    for (_ <- 1 to 200; (name, mid) <- Seq(("cosine", 0), ("l2", 1), ("dot", 2))) {
      val v = randVec(rng, 64)
      val viaKernel = IvfKernels.nearest(arrayData(v), cents, mid)
      val metric = Metrics.byName(name)
      val viaScan = cents.indices.minBy(i => (metric(v, cents(i)), i))
      assert(viaKernel == viaScan, s"metric $name")
    }
  }

  test("IvfKernels.probes is ordered by (distance, index) and distinct") {
    val rng = new Random(8)
    val cents = Array.fill(16)(randVec(rng, 64))
    for (_ <- 1 to 100) {
      val v = randVec(rng, 64)
      val probes = IvfKernels.probes(arrayData(v), cents, 1, 6)
      assert(probes.distinct.length == 6)
      val ds = probes.map(c => IvfKernels.dist(arrayData(v), cents(c), 1))
      assert(ds.zip(ds.tail).forall { case (a, b) => a <= b })
      // the first probe is the nearest cell
      assert(probes.head == IvfKernels.nearest(arrayData(v), cents, 1))
    }
  }

  test("PqKernels: ADC to a vector's own code equals its summed subspace quantization error") {
    val rng = new Random(9)
    val codebook = Array.fill(PqKernels.NumSub)(Array.fill(16)(randVec(rng, 4)))
    for (_ <- 1 to 100) {
      val v = randVec(rng, 64)
      val code = PqKernels.encode(arrayData(v), codebook)
      val adc = PqKernels.adc(arrayData(v), code, codebook)
      // independently: per subspace, the min distance to any centroid
      val sd = PqKernels.subDim(64)
      val expected = (0 until PqKernels.NumSub).map { s =>
        val slice = Array.tabulate(sd)(i => v(s * sd + i))
        codebook(s).map(c => Metrics.l2Sq(slice, c)).min
      }.sum
      assert(math.abs(adc - expected) < 1e-9, s"adc=$adc expected=$expected")
    }
  }

  test("bitstring->long packing preserves Hamming distance (the d_neardup_hamming bridge)") {
    // the catalog converts SimHash bitstrings to longs with bit k at
    // string position k+1; Hamming over the longs must equal the count
    // of differing string positions (the oracle's formulation)
    val rng = new Random(10)
    def pack(bits: String): Long =
      (0 until 64).foldLeft(0L)((acc, k) =>
        if (bits.charAt(k) == '1') acc | (1L << k) else acc)
    for (_ <- 1 to 200) {
      val a = Seq.fill(64)(if (rng.nextBoolean()) '1' else '0').mkString
      val b = Seq.fill(64)(if (rng.nextBoolean()) '1' else '0').mkString
      val viaStrings = (0 until 64).count(i => a.charAt(i) != b.charAt(i))
      val viaLongs = java.lang.Long.bitCount(pack(a) ^ pack(b))
      assert(viaStrings == viaLongs)
    }
  }
}
