package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Codec sniffing: extension chooses the format, looking through one
  * trailing compression suffix (the reference's path.suffixes chain). */
class FileSourceSpec extends AnyFunSuite {

  test("sniffFormat picks the codec by extension") {
    assert(FileSource.sniffFormat("/data/x.parquet") == "parquet")
    assert(FileSource.sniffFormat("/data/x.jsonl") == "jsonl")
    assert(FileSource.sniffFormat("/data/x.CSV") == "csv")
    assert(FileSource.sniffFormat("s3://bucket/dir/x.yaml") == "yaml")
  }

  test("sniffFormat looks through compression suffixes") {
    assert(FileSource.sniffFormat("/data/x.json.gz") == "json")
    assert(FileSource.sniffFormat("/data/x.csv.bz2") == "csv")
    assert(FileSource.sniffFormat("/data/x.txt.zst") == "txt")
  }

  test("sniffFormat rejects extensionless paths") {
    intercept[RuntimeException] { FileSource.sniffFormat("/data/noext") }
  }
}
