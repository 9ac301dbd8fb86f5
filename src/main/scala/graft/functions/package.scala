package graft

import org.apache.spark.sql.Column

/** Public facade for graft's native Catalyst expressions. */
package object functions {
  object VectorExprs {
    /** Codegen'd BIGINT-array dot product: Σ xᵢ·yᵢ over the common
      * prefix (implementation: o.a.s.sql.graftfns.DotProductL). */
    def dotL(x: Column, y: Column): Column =
      org.apache.spark.sql.graftfns.GraftFns.dotL(x, y)
  }
}
