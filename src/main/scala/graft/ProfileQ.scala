package graft

import java.util.concurrent.ConcurrentLinkedQueue

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Optimization-round profiler (guide §1): times one or more queries in
  * isolation with the SAME session/config/measurement discipline as
  * [[Bench]] (min-of-REPS, scoped caches, count() action plus an
  * optional forced `toRdd.count()` pass), and additionally
  *
  *  - prints a per-STAGE wall-time table for the final rep (stage name,
  *    task count, total task time, max task time) so the expensive
  *    stage of a multi-job query is attributable without the UI, and
  *  - writes `explain("formatted")` to `$SPARK_GRAFT_PLAN_DIR/<key>_<tag>.txt`
  *    (default plans/r20) when
  *    SPARK_GRAFT_PLAN_TAG is set (the judge-facing plan artifacts).
  *
  * Usage: sbt "runMain graft.ProfileQ key1,key2[,...]" with the usual
  * SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS. Not part of the driver
  * contract; purely a measurement harness.
  */
object ProfileQ {
  private val REPS = 3

  private case class StageRow(name: String, tasks: Int, wallMs: Long,
    taskMs: Long, maxTaskMs: Long, shuffleReadMb: Double,
    shuffleWriteMb: Double)

  def main(args: Array[String]): Unit = {
    val keys = args.headOption.getOrElse("q1_agg").split(",").map(_.trim)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val planTag = sys.env.get("SPARK_GRAFT_PLAN_TAG")
    val forced = sys.env.get("SPARK_GRAFT_PROFILE_FORCED").exists(_ == "1")
    val spark = GraftSession.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // SPARK_GRAFT_CONF="k=v;k=v": session-conf overrides for paired
    // engine-gate measurements (e.g. graft.walk.localMax=0 forces the
    // distributed walk for a before-plan capture).
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k.trim, v.trim)
    })

    val stages = new ConcurrentLinkedQueue[StageRow]()
    // per-stage max task duration from task-end events (r20, the r19
    // advisory: the field was recorded as 0 and never printed) — the
    // straggler signal guide §2.5 reads off the stage page
    val maxTask = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (record && te.taskInfo != null) {
          maxTask.merge(te.stageId, te.taskInfo.duration, math.max(_, _))
        }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (record) {
          val si = sc.stageInfo
          val wall = (for {
            a <- si.completionTime; b <- si.submissionTime
          } yield a - b).getOrElse(0L)
          val m = si.taskMetrics
          // attribute the stage to engine code, not the Dataset action
          // thread: the first graft frame in the long callsite beats
          // "$anonfun$withThreadLocalCaptured" (r20)
          val name = si.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("ProfileQ"))
            .map(_.trim.take(90)).getOrElse(si.name.takeWhile(_ != '\n')
              .take(90))
          stages.add(StageRow(
            name, si.numTasks, wall,
            m.executorRunTime,
            Option(maxTask.get(si.stageId)).getOrElse(0L),
            m.shuffleReadMetrics.totalBytesRead / 1e6,
            m.shuffleWriteMetrics.bytesWritten / 1e6))
        }
    })

    // Same warmup as Bench so numbers are comparable.
    spark.range(1000000).selectExpr("sum(id)").collect()
    Tables.names.foreach { t =>
      try Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    val warmDir = {
      val sib = new java.io.File(new java.io.File(sfDir).getParentFile, "sf0.001")
      if (sib.isDirectory) sib.toString else sfDir
    }
    Seq("dedup_minhash_lsh", "ann_lsh").foreach { q =>
      try SparkEntry.queries(q)(spark, warmDir).count()
      catch { case _: Throwable => () }
    }
    Caches.releaseScope()

    def secs(body: => Unit): Double = {
      val t0 = System.nanoTime()
      body
      (System.nanoTime() - t0) / 1e9
    }

    // SPARK_GRAFT_PLAN_ONLY=1: skip the timed reps, only write the
    // explain("formatted") artifacts (cheap before/after plan capture).
    val planOnly = sys.env.get("SPARK_GRAFT_PLAN_ONLY").exists(_ == "1")
    keys.foreach { key =>
      val fn = SparkEntry.queries(key)
      if (planOnly) {
        planTag.foreach { tag =>
          val dir = java.nio.file.Paths.get(
            sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r20"))
          java.nio.file.Files.createDirectories(dir)
          val df = fn(spark, sfDir)
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.write(dir.resolve(s"${key}_$tag.txt"),
            txt.getBytes("UTF-8"))
          println(s"    [plan] wrote $dir/${key}_$tag.txt")
        }
        Caches.releaseScope()
      } else {
      // SPARK_GRAFT_PROFILE_FIRST=1: record the COLD rep's stage table
      // instead of the warm one — the materialization_total lever
      // (guide §1.2: the artifact build is a different plan than the
      // warm read, so it needs its own attribution).
      val profileFirst =
        sys.env.get("SPARK_GRAFT_PROFILE_FIRST").exists(_ == "1")
      val recordRep = if (profileFirst) 1 else REPS
      val runs = (1 to REPS).map { i =>
        if (i == recordRep) { stages.clear(); maxTask.clear(); record = true }
        spark.sparkContext.setJobDescription(s"$key rep$i")
        val t = secs {
          val df = fn(spark, sfDir)
          if (forced) df.queryExecution.toRdd.count() else df.count()
        }
        if (i == recordRep) record = false
        t
      }
      println(f"[profile] $key%-28s min=${runs.min}%7.3f first=${runs.head}%7.3f runs=${runs.map(r => f"$r%.3f").mkString(",")}")
      // stage table of the recorded rep (warm by default), heaviest first
      import scala.jdk.CollectionConverters._
      val rows = stages.asScala.toSeq.sortBy(-_.wallMs).take(18)
      rows.foreach { r =>
        println(f"    ${r.wallMs}%6d ms  tasks=${r.tasks}%3d taskSum=${r.taskMs}%6d ms maxTask=${r.maxTaskMs}%5d ms shR=${r.shuffleReadMb}%8.2f MB shW=${r.shuffleWriteMb}%8.2f MB  ${r.name}")
      }
      println(f"    [stages] n=${stages.size} wallSum=${stages.asScala.map(_.wallMs).sum} ms")
      planTag.foreach { tag =>
        val dir = java.nio.file.Paths.get(
          sys.env.getOrElse("SPARK_GRAFT_PLAN_DIR", "plans/r20"))
        java.nio.file.Files.createDirectories(dir)
        val p = dir.resolve(s"${key}_$tag.txt")
        val df = fn(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.write(p, txt.getBytes("UTF-8"))
        println(s"    [plan] wrote $p")
      }
      Caches.releaseScope()
      }
    }
    spark.stop()
  }
}
