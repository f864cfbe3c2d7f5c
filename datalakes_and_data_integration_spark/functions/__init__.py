"""Column-function libraries: deterministic hashing, text analysis,
similarity. All pure Spark SQL expressions (JVM-side, codegen) — Python here
only *builds* expression trees, it never executes per row."""
