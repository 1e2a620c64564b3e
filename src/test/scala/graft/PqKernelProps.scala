package graft

import graft.functions.PqKernels
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.scalacheck.{Gen, Prop, Properties}

/** Pure-JVM properties for the PQ kernels (the oracle pins them on fixture
  * embeddings; random vectors pin the kernel invariants off-distribution):
  * codes index real centroids, the reported reconstruction error IS the
  * sum of the chosen cells' distances, the distance tables agree with a
  * direct recomputation, and malformed inputs return null rather than
  * garbage.
  */
object PqKernelProps extends Properties("PqKernels") {

  private val vecGen: Gen[Array[Float]] =
    Gen.listOfN(64, Gen.chooseNum(-1.0f, 1.0f)).map(_.toArray)

  private def arr(v: Array[Float]): ArrayData =
    new GenericArrayData(v.map(x => x: Any))

  private def dist(v: Array[Float], s: Int, j: Int): Double = {
    var acc = 0.0
    var i = 0
    while (i < PqKernels.Dims) {
      val e = v(s * PqKernels.Dims + i).toDouble - PqKernels.centroid(s, j, i)
      acc += e * e
      i += 1
    }
    acc
  }

  property("codes are argmin indices and err is the sum of chosen distances") =
    Prop.forAll(vecGen) { v =>
      val row = PqKernels.encode(arr(v))
      val codes = row.getArray(0).toIntArray()
      val err = row.getDouble(1)
      val expectedErr = (0 until PqKernels.Subspaces).map { s =>
        (0 until PqKernels.Centroids).map(j => dist(v, s, j)).min
      }.sum
      codes.zipWithIndex.forall { case (c, s) =>
        c >= 0 && c < PqKernels.Centroids &&
          dist(v, s, c) == (0 until PqKernels.Centroids).map(j => dist(v, s, j)).min
      } && err == expectedErr
    }

  property("distance tables equal direct recomputation, everywhere") =
    Prop.forAll(vecGen) { v =>
      val tables = PqKernels.distTables(arr(v))
      (0 until PqKernels.Subspaces).forall { s =>
        val t = tables.getArray(s).toDoubleArray()
        (0 until PqKernels.Centroids).forall(j => t(j) == dist(v, s, j))
      }
    }

  property("malformed embeddings (wrong length) return null, never garbage") =
    Prop.forAll(Gen.chooseNum(0, 63)) { n =>
      val short = new GenericArrayData(Array.fill[Any](n)(0.5f))
      PqKernels.encode(short) == null && PqKernels.distTables(short) == null
    }
}
