package graft

import graft.sources.RdaReader
import graft.sources.RdaReader._

/** Prints the shape of every object in the reference's bundled .rda
  * datasets — a structural probe for the RdaReader source. */
object RdaProbe {
  def describe(o: RObj, indent: String = "  "): String = o match {
    case RNull       => "NULL"
    case RSym(n)     => s"sym($n)"
    case RInt(v, a)  => s"int[${v.length}] attrs=${a.keys.mkString(",")}"
    case RReal(v, a) => s"real[${v.length}] attrs=${a.keys.mkString(",")}"
    case RLgl(v, a)  => s"lgl[${v.length}] attrs=${a.keys.mkString(",")}"
    case RStr(v, a)  => s"str[${v.length}] attrs=${a.keys.mkString(",")}"
    case RList(v, a) =>
      val nm = names(o)
      val items = v.zipWithIndex.map { case (x, i) =>
        val label = if (i < nm.length) nm(i) else s"[$i]"
        s"$indent$label: ${describe(x, indent + "  ")}"
      }.mkString("\n")
      s"list[${v.length}] attrs=${a.keys.mkString(",")}\n$items"
    case RS4(a) =>
      s"S4 slots=${a.keys.mkString(",")}" + (a.get("Dim") match {
        case Some(RInt(d, _)) => s" dim=${d.mkString("x")}"
        case _                => ""
      })
  }

  def main(args: Array[String]): Unit = {
    for (name <- Seq("bodyfat", "abalone", "heart", "wine", "student")) {
      val m = RdaReader.read(s"/root/reference/data/$name.rda")
      m.foreach { case (k, v) => println(s"$name/$k: ${describe(v)}") }
    }
  }
}
