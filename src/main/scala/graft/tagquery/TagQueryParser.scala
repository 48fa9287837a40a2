package graft.tagquery

import graft.functions.GraftFunctions
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Tag-query expression language → Catalyst `Column` compiler.
 *
 * Grammar parity with the reference's ANTLR grammar
 * (core/metrics-core-service/src/main/antlr4/.../TagQuery.g4:40-110):
 *
 * {{{
 *   object : pair | '(' object ')' | object (AND|OR) object
 *   pair   : key | NOT key | key (=|!=) value | key (~|!~) value
 *          | key [NOT] IN '[' value, ... ']'
 *   key    : [a-zA-Z_0-9.]+        value: key | 'quoted \' text'
 * }}}
 *
 * AND and OR have EQUAL precedence and associate LEFT, exactly like the
 * reference's left-recursive ANTLR rule — `a OR b AND c` is `(a OR b) AND c`.
 *
 * Evaluation semantics (ExpressionTagQueryParser.java:127-263):
 *  - `k`            metrics having tag k
 *  - `NOT k`        metrics lacking tag k
 *  - `k = v`        exact value match
 *  - `k != v`       has k, value != v (exact)
 *  - `k ~ p`        has k, value matches filter-pattern p (PatternUtil:
 *                   `*` = all, leading `!` = negation, full-regex match)
 *  - `k !~ p`       has k, value does NOT match p
 *  - `k IN [..]`    has k, value matches ANY of the patterns
 *  - `k NOT IN [..]` has k, value matches NONE of the patterns
 *  - AND = set intersect, OR = set union (here: boolean algebra over one
 *    catalog scan — Catalyst replaces the reference's per-leaf index seeks
 *    and cost-group reordering, SimpleTagQueryParser.java:121-189)
 *
 * The whole cost-based predicate-ordering machinery of the reference (§4 of
 * SURVEY.md) dissolves: the compiled Column is one scan over the catalog.
 */
object TagQueryParser {

  sealed trait Ast
  final case class HasKey(key: String) extends Ast
  final case class NotKey(key: String) extends Ast
  final case class Eq(key: String, value: String) extends Ast
  final case class Neq(key: String, value: String) extends Ast
  final case class Regex(key: String, pattern: String) extends Ast
  final case class NotRegex(key: String, pattern: String) extends Ast
  final case class In(key: String, values: Seq[String]) extends Ast
  final case class NotIn(key: String, values: Seq[String]) extends Ast
  final case class And(l: Ast, r: Ast) extends Ast
  final case class Or(l: Ast, r: Ast) extends Ast

  /** Parse a tag-query expression; throws IllegalArgumentException on bad input. */
  def parse(input: String): Ast = new Parser(tokenize(input)).parseQuery()

  /** Compile to a predicate over a catalog frame's `tags: map<string,string>` column. */
  def compile(ast: Ast, tags: Column): Column = ast match {
    case HasKey(k)   => map_contains_key(tags, lit(k))
    case NotKey(k)   => !map_contains_key(tags, lit(k))
    case Eq(k, v)    => element_at(tags, k) === v
    case Neq(k, v)   => element_at(tags, k) =!= v
    case Regex(k, p) => GraftFunctions.filterPattern(element_at(tags, k), p)
    case NotRegex(k, p) =>
      element_at(tags, k).isNotNull && !GraftFunctions.filterPattern(element_at(tags, k), p)
    case In(_, Seq()) => lit(false) // IN [] matches nothing
    case In(k, vs) =>
      vs.map(p => GraftFunctions.filterPattern(element_at(tags, k), p)).reduce(_ || _)
    case NotIn(k, Seq()) => map_contains_key(tags, lit(k)) // has key, excluded by nothing
    case NotIn(k, vs) =>
      element_at(tags, k).isNotNull &&
        !vs.map(p => GraftFunctions.filterPattern(element_at(tags, k), p)).reduce(_ || _)
    case And(l, r) => compile(l, tags) && compile(r, tags)
    case Or(l, r)  => compile(l, tags) || compile(r, tags)
  }

  def compile(input: String, tags: Column): Column = compile(parse(input), tags)

  /** The legacy simple `name:pattern,name:pattern` syntax (reference
    * SimpleTagQueryParser / Tags.parse + PatternUtil filter semantics):
    * AND of per-name filter patterns — `*` any, leading `!` on the
    * VALUE negates the regex, regex otherwise. A leading `!` on the
    * NAME means the tag must NOT exist (the parser's GROUP_C,
    * SimpleTagQueryParser.java:156-158,467 `tagNotExistsFilter`; its
    * value is parsed and IGNORED, matching the reference's
    * Query(key, value) → name-only filter). The facade falls back to
    * this when the expression grammar rejects the input, like the
    * reference does. */
  def compileSimple(input: String, tags: Column): Column =
    graft.model.Tags.parse(input).map {
      case (k, _) if k.startsWith("!") =>
        org.apache.spark.sql.functions.element_at(tags, k.substring(1)).isNull
      case (k, pat) =>
        graft.functions.GraftFunctions.filterPattern(
          org.apache.spark.sql.functions.element_at(tags, k), pat)
    }.reduce(_ && _)

  // --------------------------- lexer ---------------------------

  sealed trait Token
  private case object LParen extends Token
  private case object RParen extends Token
  private case object LBracket extends Token
  private case object RBracket extends Token
  private case object Comma extends Token
  private case object EqTok extends Token
  private case object NeqTok extends Token
  private case object TildeTok extends Token
  private case object NotTildeTok extends Token
  private case object AndTok extends Token
  private case object OrTok extends Token
  private case object NotTok extends Token
  private case object InTok extends Token
  private final case class Text(value: String, quoted: Boolean) extends Token

  private def tokenize(input: String): List[Token] = {
    val out = List.newBuilder[Token]
    var i = 0
    val n = input.length
    while (i < n) {
      val c = input.charAt(i)
      if (c.isWhitespace) i += 1
      else c match {
        case '(' => out += LParen; i += 1
        case ')' => out += RParen; i += 1
        case '[' => out += LBracket; i += 1
        case ']' => out += RBracket; i += 1
        case ',' => out += Comma; i += 1
        case '=' => out += EqTok; i += 1
        case '~' => out += TildeTok; i += 1
        case '!' =>
          if (i + 1 < n && input.charAt(i + 1) == '=') { out += NeqTok; i += 2 }
          else if (i + 1 < n && input.charAt(i + 1) == '~') { out += NotTildeTok; i += 2 }
          else throw new IllegalArgumentException(s"Unexpected '!' at $i in: $input")
        case '\'' =>
          val sb = new StringBuilder
          i += 1
          var closed = false
          while (i < n && !closed) {
            input.charAt(i) match {
              case '\'' => closed = true; i += 1
              case '\\' if i + 1 < n =>
                input.charAt(i + 1) match {
                  case 'b' => sb += '\b'; i += 2
                  case 'f' => sb += '\f'; i += 2
                  case 'n' => sb += '\n'; i += 2
                  case 'r' => sb += '\r'; i += 2
                  case 't' => sb += '\t'; i += 2
                  case 'u' if i + 5 < n =>
                    sb += Integer.parseInt(input.substring(i + 2, i + 6), 16).toChar; i += 6
                  case other => sb += other; i += 2
                }
              case other => sb += other; i += 1
            }
          }
          if (!closed) throw new IllegalArgumentException(s"Unterminated quote in: $input")
          out += Text(sb.result(), quoted = true)
        case _ if isSimple(c) =>
          val start = i
          while (i < n && isSimple(input.charAt(i))) i += 1
          val word = input.substring(start, i)
          word.toUpperCase match {
            case "AND" => out += AndTok
            case "OR"  => out += OrTok
            case "NOT" => out += NotTok
            case "IN"  => out += InTok
            case _     => out += Text(word, quoted = false)
          }
        case other => throw new IllegalArgumentException(s"Unexpected '$other' at $i in: $input")
      }
    }
    out.result()
  }

  private def isSimple(c: Char): Boolean =
    c.isLetterOrDigit && c < 128 || c == '_' || c == '.'

  // --------------------------- parser ---------------------------

  private final class Parser(var tokens: List[Token]) {

    def parseQuery(): Ast = {
      val ast = parseObject()
      if (tokens.nonEmpty) throw new IllegalArgumentException(s"Trailing tokens: $tokens")
      ast
    }

    /** Left-associative chain of AND/OR at equal precedence (TagQuery.g4
      * `object logical_operator object` is left-recursive in ANTLR). */
    private def parseObject(): Ast = {
      var left = parseTerm()
      var continue = true
      while (continue) tokens match {
        case AndTok :: rest => tokens = rest; left = And(left, parseTerm())
        case OrTok :: rest  => tokens = rest; left = Or(left, parseTerm())
        case _              => continue = false
      }
      left
    }

    private def parseTerm(): Ast = tokens match {
      case LParen :: rest =>
        tokens = rest
        val inner = parseObject()
        tokens match {
          case RParen :: r2 => tokens = r2; inner
          case _            => throw new IllegalArgumentException("Expected ')'")
        }
      case NotTok :: Text(k, false) :: rest => tokens = rest; NotKey(k)
      case Text(k, false) :: rest =>
        tokens = rest
        tokens match {
          case EqTok :: rest2       => tokens = rest2; Eq(k, parseValue())
          case NeqTok :: rest2      => tokens = rest2; Neq(k, parseValue())
          case TildeTok :: rest2    => tokens = rest2; Regex(k, parseValue())
          case NotTildeTok :: rest2 => tokens = rest2; NotRegex(k, parseValue())
          case InTok :: rest2       => tokens = rest2; In(k, parseArray())
          case NotTok :: InTok :: rest2 => tokens = rest2; NotIn(k, parseArray())
          case _                    => HasKey(k)
        }
      case other => throw new IllegalArgumentException(s"Unexpected token(s): $other")
    }

    private def parseValue(): String = tokens match {
      case Text(v, _) :: rest => tokens = rest; v
      case other              => throw new IllegalArgumentException(s"Expected value, got: $other")
    }

    private def parseArray(): Seq[String] = tokens match {
      case LBracket :: RBracket :: rest => tokens = rest; Seq.empty
      case LBracket :: rest =>
        tokens = rest
        val vals = Seq.newBuilder[String]
        vals += parseValue()
        var continue = true
        while (continue) tokens match {
          case Comma :: r2    => tokens = r2; vals += parseValue()
          case RBracket :: r2 => tokens = r2; continue = false
          case other          => throw new IllegalArgumentException(s"Expected ',' or ']', got: $other")
        }
        vals.result()
      case other => throw new IllegalArgumentException(s"Expected '[', got: $other")
    }
  }
}
