package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Diagnostic (guide §1): split one query's warm wall time into Spark JOBS
  * (count, per-job wall, task time) vs everything else (driver-side
  * planning, collects, codegen). A query whose wall ≫ Σ job wall is
  * driver/planning-bound; one with many tiny jobs is job-count-bound
  * (iterative loops, checkpoint materializations); one with a single hot
  * job is where the classic stage-level playbook applies.
  *
  * Usage: runMain graft.tools.JobProfile <q1,q2,...> [sfDir] [reps]
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) scala.util.Try(args(2).toInt).getOrElse(3) else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // jobId -> (startNs-at-submit, description) collected by the listener;
    // cleared per rep. Synchronized: listener events arrive on the bus thread.
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    val taskTimeMs = new java.util.concurrent.atomic.AtomicLong(0L)
    val nTasks = new java.util.concurrent.atomic.AtomicLong(0L)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Int)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.put(e.jobId, (System.nanoTime(), desc))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val st = jobs.remove(e.jobId)
        if (st != null) done.add((e.jobId, System.nanoTime() - st._1, st._2))
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        taskTimeMs.addAndGet(e.stageInfo.taskMetrics.executorRunTime)
        nTasks.addAndGet(e.stageInfo.numTasks.toLong)
        stages.add((e.stageInfo.stageId, e.stageInfo.name,
          e.stageInfo.taskMetrics.executorRunTime, e.stageInfo.numTasks))
      }
    })

    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      for (i <- 1 to reps) {
        done.clear(); taskTimeMs.set(0L); nTasks.set(0L); stages.clear()
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        // the listener bus is async; give tail events a moment to land
        Thread.sleep(200)
        val jl = done.toArray(Array.empty[(Int, Long, String)]).sortBy(_._1)
        val jobWall = jl.map(_._2).sum / 1e9
        println(f"[jobprofile] $name rep $i: wall=$wall%.3f s, jobs=${jl.size}, " +
          f"sum_job_wall=$jobWall%.3f s, task_time=${taskTimeMs.get / 1e3}%.3f s, " +
          f"tasks=${nTasks.get}, rows=$n")
        if (i == reps) {
          jl.foreach { case (id, ns, desc) =>
            println(f"[jobprofile]   job $id%3d ${ns / 1e9}%7.3f s  $desc")
          }
          // hottest stages by summed task time — where the compute lives
          stages.toArray(Array.empty[(Int, String, Long, Int)])
            .sortBy(-_._3).take(8).foreach { case (sid, nm, ms, nt) =>
              println(f"[jobprofile]   stage $sid%4d ${ms / 1e3}%8.3f s task-time ($nt%3d tasks)  ${nm.take(110)}")
            }
        }
      }
    }
    spark.stop()
  }
}
