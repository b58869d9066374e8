package graft.tools
object ListGates {
  def main(args: Array[String]): Unit = {
    graft.SparkEntry.allDefs.foreach(d => println(d.name + "\t" + d.oracle.isDefined))
  }
}
