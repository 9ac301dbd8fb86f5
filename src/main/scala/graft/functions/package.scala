package graft

import org.apache.spark.sql.Column

/** Public facade for graft's native Catalyst expressions. */
package object functions {
  object VectorExprs {
    /** Codegen'd BIGINT-array dot product: Σ xᵢ·yᵢ over the common
      * prefix (implementation: o.a.s.sql.graftfns.DotProductL). */
    def dotL(x: Column, y: Column): Column =
      org.apache.spark.sql.graftfns.GraftFns.dotL(x, y)

    /** Codegen'd lowercase-hex slice → BIGINT (1-based `start`, `len`
      * nibbles) — one byte pass replacing a chain of
      * instr(substr)·16ᵏ builtins (implementation:
      * o.a.s.sql.graftfns.HexSliceToLong; exact-parity contract with
      * that composed form documented there). */
    def hexSlice(x: Column, start: Int, len: Int): Column =
      org.apache.spark.sql.graftfns.GraftFns.hexSlice(x, start, len)
  }
}
