package graft.operators

/** Shared DuckDB-oracle SQL fragments. */
private[operators] object OracleSql {
  /** BIGINT from `len` lowercase-hex nibbles of `expr` starting at the
    * 1-based nibble `start` — the oracle twin of the native codegen'd
    * hexSlice expression (VectorExprs.hexSlice). ONE definition of the
    * strpos/shift chain so the cross-engine parity contract cannot
    * drift per call site (a mistyped shift constant in a hand-copied
    * chain is a silent hash mismatch). Earlier rounds inlined this
    * snippet; new oracles must use the helper and old ones migrate as
    * they are touched. */
  def hexToLong(expr: String, start: Int, len: Int): String =
    (0 until len).map { i =>
      s"(strpos('0123456789abcdef', substr($expr, ${start + i}, 1)) - 1) * ${1L << (4 * (len - 1 - i))}"
    }.mkString(" + ")
}
