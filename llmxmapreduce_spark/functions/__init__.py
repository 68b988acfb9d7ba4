"""Column-level functions: the reference's scalar operators as Spark SQL
expressions (JVM-side, codegen'd) wherever possible, pandas UDFs otherwise."""
