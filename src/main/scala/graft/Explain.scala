package graft

/** Plan dumper: `runMain graft.Explain <query> [sfDir]` prints the
  * executed (pre-AQE) physical plan of any registered query — the
  * explain-and-iterate loop the scale discipline requires, runnable
  * without an interactive shell.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Sessions.local("graft-explain")
    val all = SparkEntry.queries ++ SparkEntry.benchOnlyDefs.map(d => d.name -> d.fn)
    println("BEGIN_PLAN " + name)
    println(all(name)(spark, dir).queryExecution.executedPlan.toString)
    println("END_PLAN")
    spark.stop()
  }
}
