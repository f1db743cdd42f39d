package graft

import java.nio.file.{Files, Paths}

/** Regenerates the committed plan-shape manifest
  * (docs/plan_shapes.tsv) that PlanShapeSpec diffs against. Run after
  * any intentional plan change:
  *
  *   sbt "runMain graft.PlanShapeDump"
  *
  * Shapes are computed at sf0.001 (plan shape is data-independent up
  * to stats-driven join strategy, which is stable for a fixed SF dir)
  * so the CI re-computation stays cheap.
  */
object PlanShapeDump {
  val SfDir = "/root/testdata/sf0.001"
  val ManifestPath = "docs/plan_shapes.tsv"

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.getOrCreate("local[8]", 8)
    val shapes = graft.util.PlanShape.shapesForAll(spark, SfDir)
    Files.createDirectories(Paths.get("docs"))
    Files.writeString(Paths.get(ManifestPath),
      graft.util.PlanShape.renderManifest(shapes))
    println(s"wrote $ManifestPath (${shapes.size} queries)")
    graft.util.PlanCache.clear(spark)
    spark.stop()
  }
}
