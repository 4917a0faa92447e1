package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * The package's one engine-portable seeded hash: the first `nibbles`
 * hex digits of md5, as a BIGINT — uniform on [0, 16^nibbles), and
 * identically computable in any engine with md5 + string ops (the
 * DuckDB oracles replay it as a strpos-weighted nibble sum). Every
 * seeded decision in the repo (splits, mask positions, FIM cuts, ICT
 * picks, DSIR buckets) goes through THIS arithmetic; it lives in one
 * place because each copy must match a hand-written SQL replay —
 * drift in any copy silently breaks bit-exact oracle parity.
 */
object SeededHash {

  /** First `nibbles` hex digits of md5(c), as a long. */
  def md5Nibbles(c: Column, nibbles: Int): Column = {
    require(nibbles >= 1 && nibbles <= 15,
      s"nibbles must be in [1, 15] to fit a long, got $nibbles")
    conv(substring(md5(c), 1, nibbles), 16, 10).cast("long")
  }
}
