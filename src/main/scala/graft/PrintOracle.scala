package graft
object PrintOracle {
  def main(args: Array[String]): Unit = {
    val name = args(0); val shards = args(1).toInt
    val sql = name match {
      case "pagerank" => graft.queries.CorpusQueries.pagerankOracle(shards)
      case "spanrm" => graft.queries.CorpusQueries.dupSpanRemovalOracle(shards)
    }
    java.nio.file.Files.writeString(java.nio.file.Paths.get(args(2)), sql)
  }
}
