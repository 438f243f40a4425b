package graft.tools
import org.apache.spark.sql.functions._
object CodegenCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.GraftSession.build("4")
    import spark.implicits._
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 2.0), "0101", "0111", 5L))
      .toDF("a", "b", "s1", "s2", "k")
      .select(
        graft.functions.Vectors.cosine(col("a"), col("b")).as("cos"),
        graft.functions.Vectors.hamming(col("s1"), col("s2")).as("ham"),
        explode(org.apache.spark.sql.GraftExpressionBridge.column(
          graft.expressions.BitFlipProbes(
            org.apache.spark.sql.GraftExpressionBridge.expression(col("k")), 4))).as("probe"))
    val code = org.apache.spark.sql.execution.debug.codegenString(df.queryExecution.executedPlan)
    println("HAS_COSINE_IN_CODEGEN=" + code.contains("cosine") )
    println("SUBTREES=" + code.linesIterator.take(2).mkString("|"))
    df.collect().foreach(r => println("ROW " + r))
    // WholeStageCodegen must cover the project (no fallback)
    println(s"${code.split("== Subtree").length - 1} codegen subtrees")
    spark.stop()
  }
}
