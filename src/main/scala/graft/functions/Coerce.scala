package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** String→typed coercion probes (imaging metadata family).
  *
  * The reference's `getValidationMap` (register-omero.py:249-268) probes
  * every TSV property value with Python's `int()`/`float()` and keeps the
  * first parse that succeeds, falling back to the raw string. Distributed
  * form: the probe is a regex classification (codegen'd, no exceptions as
  * control flow — throwing per cell would be pathological on a 100 TB
  * scan) and the typed value is a struct with exactly one populated arm,
  * so the error channel is the `kind` field itself, never an abort.
  */
object Coerce {
  /** Python `int(v)` acceptance (sign + digits; no floats). */
  val IntRx = "^[+-]?[0-9]+$"

  /** Python `float(v)` acceptance for finite decimal/exponent literals
    * ("inf"/"nan" excluded by design — the reference's metadata never
    * carries them and the oracle's regex dialect stays portable). */
  val FloatRx = "^[+-]?([0-9]+\\.?[0-9]*|\\.[0-9]+)([eE][+-]?[0-9]+)?$"

  /** 'int' | 'float' | 'string' — first matching probe wins, like the
    * reference's try-int-then-float chain. */
  def kind(v: Column): Column =
    when(regexp_like(v, lit(IntRx)), "int")
      .when(regexp_like(v, lit(FloatRx)), "float")
      .otherwise("string")

  /** Typed value with per-row fallback: struct(kind, int_val, float_val,
    * str_val) where exactly one value arm is non-null. `try_cast` guards
    * the int arm against overflow past bigint (the regex can't). */
  def typed(v: Column): Column = {
    val k = kind(v)
    struct(k.as("kind"),
      when(k === "int", v.try_cast("long")).as("int_val"),
      when(k === "float", v.try_cast("double")).as("float_val"),
      when(k === "string", v).as("str_val"))
  }

  /** `getValidationMap`: lowercase the keys of a string property map and
    * coerce every value to its typed struct. */
  def validationMap(m: Column): Column =
    transform_values(MapOps.lowerKeys(m), (_, v) => typed(v))
}
