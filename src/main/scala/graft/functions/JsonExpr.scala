package graft.functions

import java.io.ByteArrayOutputStream

import com.fasterxml.jackson.core.{JsonEncoding, JsonGenerator,
  JsonParser, JsonToken}

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext,
  ExprCode}
import org.apache.spark.sql.graftshim.ColumnInternals
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** `get_json_object(json, '$.key')` as a CODEGEN expression — the
  * built-in is CodegenFallback (interpreted per row inside the hot
  * scan), which made the JSON family (q66/q89/q90) the top remaining
  * interpreted expression after round 18. This replicates the
  * built-in's single-named-key path EXACTLY — same Jackson parser
  * factory, same raw-style leaf rules (string values emitted unquoted
  * via writeRaw, every other value copied through a generator, FIRST
  * non-null duplicate key wins — see evaluate()), same
  * malformed-input → NULL contract — so the string output is
  * bit-identical (JsonExprSpec fuzz-pins 2000 generated cases against
  * the built-in, the HtmlExpr precedent). The long form composes
  * Spark's OWN `.cast("long")` on top, so ANSI cast semantics are the
  * query's original spelling by construction, not a replica. */
case class JsonKeyRaw(child: Expression, key: String)
    extends UnaryExpression {

  override def dataType: DataType = StringType

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"json_key_raw expects a string input, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    JsonKeyRaw.compute(input.asInstanceOf[UTF8String], key)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val keyRef = ctx.addReferenceObj("jsonKey", key, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |org.apache.spark.unsafe.types.UTF8String ${ev.value}_r =
         |  graft.functions.JsonKeyRaw.compute($c, $keyRef);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : JsonKeyRaw = copy(child = newChild)
}

object JsonKeyRaw {

  // One shared factory, like the built-in's (SharedFactory): the two
  // read features are enabled there for Hive compatibility, and the
  // fuzz spec catches their absence ({'k':1} parses). JsonFactory is
  // thread-safe for parser/generator creation.
  private val factory = new com.fasterxml.jackson.core.JsonFactoryBuilder()
    .enable(com.fasterxml.jackson.core.json.JsonReadFeature
      .ALLOW_UNESCAPED_CONTROL_CHARS)
    .enable(com.fasterxml.jackson.core.json.JsonReadFeature
      .ALLOW_SINGLE_QUOTES)
    .build()

  /** The built-in's evaluate() for path `$.key`: parse, walk the root
    * object's fields, emit every value under `key` with raw-style leaf
    * rules; null when the input is not valid JSON or nothing matched. */
  def compute(json: UTF8String, key: String): UTF8String = {
    try {
      val parser = factory.createParser(json.getBytes)
      try {
        if (parser.nextToken() == null) return null
        val output = new ByteArrayOutputStream()
        var dirty = false
        val generator = factory.createGenerator(output, JsonEncoding.UTF8)
        try {
          dirty = evaluate(parser, generator, key)
        } finally generator.close()
        if (dirty) UTF8String.fromBytes(output.toByteArray) else null
      } finally parser.close()
    } catch {
      case _: com.fasterxml.jackson.core.JacksonException => null
      case _: java.io.IOException => null
    }
  }

  /** evaluatePath(p, g, RawStyle, Key :: Named(key) :: Nil) — the
    * built-in's object walk specialised to one named key, mirroring
    * its per-TOKEN loop exactly (verified against the Spark 4.1.2
    * bytecode): the FIRST non-null match wins (once dirty, the rest of
    * the object is consumed via skipChildren); a matched JSON null
    * writes nothing, does not count as dirty, and scanning CONTINUES;
    * every other token falls to skipChildren (a no-op on field names
    * and scalars, a subtree consume on containers — which is what
    * keeps a nested "key" at depth > 1 from matching). */
  private def evaluate(p: JsonParser, g: JsonGenerator,
                       key: String): Boolean = {
    if (p.currentToken() != JsonToken.START_OBJECT) return false
    var dirty = false
    while (p.nextToken() != JsonToken.END_OBJECT) {
      if (dirty) { p.skipChildren(); () }
      else if (p.currentToken() == JsonToken.FIELD_NAME &&
          p.currentName() == key) {
        if (p.nextToken() != JsonToken.VALUE_NULL) {
          if (p.currentToken() == JsonToken.VALUE_STRING) {
            // raw style: emit the string without quotes, bypassing the
            // generator's root-value separator (the built-in's rule)
            if (p.hasTextCharacters)
              g.writeRaw(p.getTextCharacters, p.getTextOffset,
                p.getTextLength)
            else
              g.writeRaw(p.getText)
          } else {
            g.copyCurrentStructure(p)
          }
          dirty = true
        }
      } else {
        p.skipChildren()
      }
    }
    dirty
  }

  /** Drop-in for `get_json_object(c, "$." + key)`. */
  def jsonKeyRaw(c: Column, key: String): Column =
    ColumnInternals.column(JsonKeyRaw(ColumnInternals.expr(c), key))

  /** Drop-in for `get_json_object(c, "$." + key).cast("long")` — the
    * cast IS Spark's own, so ANSI semantics are untouched. */
  def jsonLongKey(c: Column, key: String): Column =
    jsonKeyRaw(c, key).cast("long")
}
