package graft.tools

/** Debug: print SparkEntry.queries iteration order (the cold-pass
  * execution order Bench inherits from Map internals). */
object QueryOrder {
  def main(args: Array[String]): Unit = {
    val ks = graft.SparkEntry.queries.keys.toList
    ks.zipWithIndex.foreach { case (k, i) => println(f"ORD $i%3d $k") }
  }
}
