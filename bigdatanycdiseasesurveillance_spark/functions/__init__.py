"""Column-expression helpers built only from pyspark.sql.functions —
everything stays JVM-side inside whole-stage codegen."""
