package scratch
object T {
  def main(a: Array[String]): Unit = {
    val g = graft.core.TextStats.wordNgrams("a b c d", 3)
    g.foreach(s => println("GRAM[" + s + "] len=" + s.length + " bytes=" + s.getBytes("UTF-8").map(b => b.toInt).mkString(",")))
    println("EQ=" + (g.toSet == Set("abc", "bcd")))
    println("SHORT=" + graft.core.TextStats.wordNgrams("a b", 3).mkString("|"))
  }
}
