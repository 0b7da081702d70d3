"""Eel ``${…}`` expression → Spark SQL translation.

The reference's mapping rules are either a plain attribute name or an Eel
expression, detected by the ``${…}`` wrapper
(``Classes/EelEvaluator.php:28-31`` using Neos' EelExpressionRecognizer)
and evaluated per record against a context containing ``record`` plus
target-provided variables (``Classes/Mapper.php:33-49``).

Here expressions compile **once** to a Spark SQL string handed to
``F.expr`` — evaluation is JVM-side, whole-stage-codegen'd, zero
per-row Python. The subset translated:

- ``record.attr``            → the column ``attr``
- other context variables    → caller-provided column prefixes
- arithmetic / comparisons   → as-is (``==``→``=``, ``!=``→``<>``)
- logical ``&&``/``||``/``!``→ ``AND``/``OR``/``NOT``
- ``+`` with a string operand→ ``||`` (Eel's + concatenates strings)
- ``cond ? a : b``           → ``CASE WHEN cond THEN a ELSE b END``
- double-quoted strings      → single-quoted
- Eel default helpers (String/Math/Date/Array/Json namespaces,
  docs examples ``README.md:239-240``) → Spark SQL builtins via the
  registry below; custom helpers are registered with
  :func:`register_helper` (template or Spark-registered UDF name).

Genuinely untranslatable logic should use the Python-UDF escape hatch:
register a function with ``spark.udf.register`` and a helper mapping to
its name.
"""

from __future__ import annotations

import re
from collections.abc import Callable

# Same shape as Neos' EelExpressionRecognizer: the whole string is ${...}.
_EEL_RE = re.compile(r"^\$\{(?P<exp>.*)\}$", re.DOTALL)

_STRING_LIT = r"'(?:[^'\\]|\\.)*'"


def is_eel_expression(rule: str) -> bool:
    """``EelEvaluator::isEelExpression`` (``Classes/EelEvaluator.php:28-31``)."""
    return _EEL_RE.match(rule) is not None


def _ucfirst(args: list[str]) -> str:
    s = args[0]
    return f"concat(upper(substring({s}, 1, 1)), substring({s}, 2))"


def _lcfirst(args: list[str]) -> str:
    s = args[0]
    return f"concat(lower(substring({s}, 1, 1)), substring({s}, 2))"


def _substr(args: list[str]) -> str:
    # Eel String.substr is 0-based; Spark substring is 1-based — but a
    # NEGATIVE start counts from the end in BOTH (PHP mb_substr and
    # Spark agree), so the +1 shift applies only to non-negative starts
    # (r11 review catch: blanket +1 made substr(s, -2) return one
    # character instead of two). Literal ints resolve at translation
    # time; dynamic starts get the CASE.
    start = args[1].strip()
    m = re.fullmatch(r"-?\d+", start)
    if m:
        shifted = str(int(start) + 1) if int(start) >= 0 else start
    else:
        shifted = f"(CASE WHEN ({start}) >= 0 THEN ({start}) + 1 ELSE ({start}) END)"
    if len(args) == 3:
        return f"substring({args[0]}, {shifted}, {args[2]})"
    return f"substring({args[0]}, {shifted}, 2147483647)"


#: PHP DateTime::format codes -> Spark (Java) datetime pattern letters.
#: Only codes with an exact Java equivalent appear; anything else is a
#: loud EelTranslationError rather than silently-wrong output.
_PHP_DATE_CODES = {
    "Y": "yyyy", "y": "yy", "m": "MM", "n": "M", "d": "dd", "j": "d",
    "H": "HH", "G": "H", "h": "hh", "g": "h", "i": "mm", "s": "ss",
    "A": "a", "D": "EEE", "l": "EEEE", "M": "MMM", "F": "MMMM",
    "u": "SSSSSS", "v": "SSS", "P": "xxx", "O": "xx", "T": "zzz",
    "e": "VV",
    # PHP composite formats that are pure Java patterns (r13, VERDICT
    # r12 ask #7): c = ISO-8601 (PHP expands to Y-m-d\TH:i:sP), r =
    # RFC 2822 (D, d M Y H:i:s O). Non-letter chars inside a Java
    # pattern are literals, so the comma/spaces need no quoting; EEE/
    # MMM render in the session locale (en-US default), matching PHP's
    # always-English r for the default deployment. The T literal's
    # pattern quotes are DOUBLED because these values land inside a
    # single-quoted SQL literal (same convention as the "'" branch of
    # the mapping loop).
    "c": "yyyy-MM-dd''T''HH:mm:ssxxx",
    "r": "EEE, dd MMM yyyy HH:mm:ss xx",
}

#: PHP codes with NO exact Java-pattern equivalent, translated as
#: non-pattern expressions instead (r12, per advisor verification that
#: Spark's proleptic datetime dialect rejects 'u'/'ww' at execution
#: time and Java 'a' emits uppercase AM/PM where PHP 'a' is lowercase):
#:   N — ISO-8601 day of week (1=Mon..7=Sun) from dayofweek() (1=Sun..7=Sat)
#:   W — ISO-8601 week number, zero-padded to 2 like PHP's date('W')
#:   a — lowercase am/pm via lower(date_format(.., 'a'))
#: Each takes (date_expr, new_literal) and returns a STRING-typed SQL
#: fragment; _date_format stitches fragments and pattern runs with concat.
#: r13 additions (VERDICT r12 ask #7), each a documented PHP/Java
#: mismatch:
#:   U — unix timestamp (no Java pattern emits epoch seconds)
#:   z — day of year, PHP 0-based where Java D is 1-based (the trap)
#:   t — days in the month (no pattern form; day(last_day(..)))
#:   L — leap year as 1/0 (Dec-31 day-of-year = 366 test)
#:   S — English ordinal suffix st/nd/rd/th (11/12/13 are all 'th')
_PHP_DATE_EXPRS = {
    "N": lambda x, lit: f"cast(((dayofweek({x}) + 5) % 7) + 1 as string)",
    "W": lambda x, lit: f"lpad(cast(weekofyear({x}) as string), 2, '0')",
    "a": lambda x, lit: f"lower(date_format({x}, {lit('a')}))",
    "U": lambda x, lit: f"cast(unix_timestamp({x}) as string)",
    "z": lambda x, lit: f"cast(dayofyear({x}) - 1 as string)",
    "t": lambda x, lit: f"cast(day(last_day({x})) as string)",
    "L": lambda x, lit: (
        f"cast(cast(dayofyear(make_date(year({x}), 12, 31)) = 366 as int)"
        " as string)"
    ),
    "S": lambda x, lit: (
        f"CASE WHEN day({x}) IN (11, 12, 13) THEN {lit('th')}"
        f" WHEN day({x}) % 10 = 1 THEN {lit('st')}"
        f" WHEN day({x}) % 10 = 2 THEN {lit('nd')}"
        f" WHEN day({x}) % 10 = 3 THEN {lit('rd')}"
        f" ELSE {lit('th')} END"
    ),
}


def _date_format(args: list[str], literals: list[str]) -> str:
    """Neos ``Date.format(date, format)`` takes PHP ``DateTime::format``
    codes; Spark's ``date_format`` takes Java patterns — passing the
    string through unmapped silently produced garbage (r11 review
    catch: ``Y-m-d`` reads as week-year/minute/day in Java). Literal
    formats are mapped code-for-code at translation time; backslash
    escapes become Java quoted literals; unmapped letters raise."""
    m = re.fullmatch(r"\x00(\d+)\x00", args[1].strip())
    if m is None:
        raise EelTranslationError(
            "Date.format requires a literal format string (PHP format "
            "codes are mapped to Spark's Java patterns at translation time)"
        )
    idx = int(m.group(1))
    php = literals[idx][1:-1]

    def new_lit(text: str) -> str:
        literals.append("'" + text + "'")
        return f"\x00{len(literals) - 1}\x00"

    # Segments: runs of Java pattern letters, interleaved with the
    # expression-translated codes (N/W/a) that have no pattern form.
    segments: list[tuple[str, str]] = []

    def add_pat(s: str) -> None:
        if segments and segments[-1][0] == "pat":
            segments[-1] = ("pat", segments[-1][1] + s)
        else:
            segments.append(("pat", s))

    # Escaped chars (\T) and literal quotes accumulate here and flush
    # as ONE Java quoted run. Per-char runs broke on the common PHP
    # adjacent-escape idiom ("\a\t"): Java's quote scan is GREEDY —
    # the first ' opens a section and '' inside it is an escaped
    # quote, so the '' between two adjacent runs reads as a quote
    # INSIDE one section, rendering "a't" (r13 advisor catch,
    # verified live). The run's quotes are SQL-DOUBLED because the
    # pattern ships inside a single-quoted SQL literal: delimiters ''
    # each, and a literal quote inside the run needs four
    # (SQL '''' -> Java '' -> one '). The same formula covers
    # quote-only runs: Java ''''…'' (a section of escaped quotes).
    #
    # NB: `php` is the SQL-escaped literal body, so one SOURCE quote
    # arrives as the two-char sequence '' — consume both as one.
    litbuf: list[str] = []

    def flush_lit() -> None:
        if litbuf:
            add_pat("''" + "".join(litbuf).replace("'", "''''") + "''")
            litbuf.clear()

    i = 0
    n = len(php)
    while i < n:
        c = php[i]
        if c == "\\" and i + 1 < n:
            if php[i + 1] == "'":
                litbuf.append("'")
                # skip the \ plus BOTH chars of the SQL-doubled quote
                i += 3 if i + 2 < n and php[i + 2] == "'" else 2
            else:
                litbuf.append(php[i + 1])
                i += 2
            continue
        if c == "'":
            litbuf.append("'")
            i += 2 if i + 1 < n and php[i + 1] == "'" else 1
            continue
        flush_lit()
        if c in _PHP_DATE_EXPRS:
            segments.append(("expr", _PHP_DATE_EXPRS[c](args[0], new_lit)))
        elif c in _PHP_DATE_CODES:
            add_pat(_PHP_DATE_CODES[c])
        elif c.isalpha():
            raise EelTranslationError(
                f"Date.format: unsupported PHP format code {c!r}"
            )
        else:
            add_pat(c)
        i += 1
    flush_lit()
    if not segments:
        literals[idx] = "''"
        return args[1]
    if len(segments) == 1 and segments[0][0] == "pat":
        literals[idx] = "'" + segments[0][1] + "'"
        return f"date_format({args[0]}, {args[1]})"
    parts = [
        f"date_format({args[0]}, {new_lit(val)})" if kind == "pat" else val
        for kind, val in segments
    ]
    if len(parts) == 1:
        return parts[0]
    return f"concat({', '.join(parts)})"


def _indexof(args: list[str]) -> str:
    return f"(instr({args[0]}, {args[1]}) - 1)"


def _format(args: list[str]) -> str:
    """``String.format(fmt, [a, b])`` (Neos StringHelper → vsprintf) →
    ``format_string(fmt, a, b)`` (java.lang.String.format). The common
    printf specifiers (%s %d %f %05d %%…) behave identically; the args
    array is splatted into Spark's varargs form. A non-literal (dynamic)
    array argument can't be splatted at translation time — raise rather
    than mistranslate."""
    if len(args) == 2 and args[1].startswith("array(") and args[1].endswith(")"):
        inner = args[1][len("array(") : -1].strip()
        return f"format_string({args[0]}, {inner})" if inner else f"format_string({args[0]})"
    if len(args) >= 2 and (args[1].startswith("array(") or args[1].startswith("[")):
        raise EelTranslationError(
            "String.format requires a literal args array (e.g. "
            '${String.format("%s-%s", [record.a, record.b])}) — a dynamic '
            "array column can't be splatted into format_string at translation time"
        )
    # varargs convenience form: String.format(fmt, a, b)
    return f"format_string({', '.join(args)})"


# PHP preg pattern → Java regex: strip the delimiters and fold the
# common flags into inline (?i)(?m)(?s)(?x) groups. 'u' (PCRE unicode)
# is Java's default and is dropped.
_PREG_RE = re.compile(r"^(.)(.*)\1([imsxu]*)$", re.DOTALL)


def _php_pattern_to_java(literals: list[str], token: str) -> str:
    m = re.fullmatch(r"\x00(\d+)\x00", token.strip())
    if m is None:
        # dynamic pattern — pass through; caller must supply Java regex
        return token
    idx = int(m.group(1))
    lit = literals[idx]
    body = lit[1:-1]  # strip SQL quotes
    pm = _PREG_RE.match(body)
    if pm and pm.group(1) in "/#~%":
        pattern, flags = pm.group(2), pm.group(3)
        inline = "".join(f"(?{f})" for f in flags if f in "imsx")
        body = inline + pattern
    # PHP allows \1 backreferences in replacements; Java wants $1
    literals[idx] = "'" + body + "'"
    return token


def _preg_match(args: list[str], literals: list[str]) -> str:
    """Neos ``String.pregMatch(s, pattern)`` returns the preg_match
    matches array; here it yields the FULL match (group 0) as a scalar —
    use ``String.pregMatchGroup(s, pattern, n)`` for a capture group.
    (Scalar instead of array: Spark SQL expressions compose better and
    query outputs must stay ArrayType-free.)"""
    return f"regexp_extract({args[0]}, {_php_pattern_to_java(literals, args[1])}, 0)"


def _preg_match_group(args: list[str], literals: list[str]) -> str:
    return (
        f"regexp_extract({args[0]}, "
        f"{_php_pattern_to_java(literals, args[1])}, {args[2]})"
    )


def _preg_replace(args: list[str], literals: list[str]) -> str:
    repl = args[2]
    m = re.fullmatch(r"\x00(\d+)\x00", repl.strip())
    if m is not None:  # \1 → $1 backrefs inside a literal replacement
        idx = int(m.group(1))
        # SQL-double-escaped backrefs first (\\1), then PHP/YAML-style
        # single-backslash ones (\1) — Spark's literal unescape would
        # otherwise reduce '\1' to the plain character '1' and silently
        # replace matches with it.
        literals[idx] = re.sub(r"\\\\(\d)", r"$\1", literals[idx])
        literals[idx] = re.sub(r"\\(\d)", r"$\1", literals[idx])
    return (
        f"regexp_replace({args[0]}, "
        f"{_php_pattern_to_java(literals, args[1])}, {repl})"
    )


def _preg_split(args: list[str], literals: list[str]) -> str:
    pat = _php_pattern_to_java(literals, args[1])
    if len(args) == 3:
        return f"split({args[0]}, {pat}, {args[2]})"
    return f"split({args[0]}, {pat})"


def _array_slice(args: list[str]) -> str:
    # Eel Array.slice is JS-style [begin, end); Spark slice is 1-based
    # (start, length). The 2-arg "rest of the array" form must use
    # size(arr) as the length — a 2^31-1 sentinel overflows Spark's
    # start+length arithmetic for any begin >= 1 and silently returns [].
    if len(args) == 3:
        return f"slice({args[0]}, ({args[1]}) + 1, ({args[2]}) - ({args[1]}))"
    return f"slice({args[0]}, ({args[1]}) + 1, size({args[0]}))"


# name → format template ({0},{1},… are the already-translated args) or a
# callable list[str] -> str for anything positional templates can't say.
_HELPERS: dict[str, str | Callable[[list[str]], str]] = {
    "String.toUpperCase": "upper({0})",
    "String.toLowerCase": "lower({0})",
    "String.firstLetterToUpperCase": _ucfirst,
    "String.firstLetterToLowerCase": _lcfirst,
    "String.trim": "trim({0})",
    "String.length": "length({0})",
    "String.replace": "replace({0}, {1}, {2})",
    "String.split": "split({0}, {1})",
    "String.substr": _substr,
    "String.indexOf": _indexof,
    "String.charAt": "substring({0}, ({1}) + 1, 1)",
    "String.startsWith": "startswith({0}, {1})",
    "String.endsWith": "endswith({0}, {1})",
    "String.toString": "cast({0} as string)",
    "String.toInteger": "cast({0} as int)",
    "String.toFloat": "cast({0} as double)",
    "String.md5": "md5({0})",
    "String.sha1": "sha1({0})",
    "String.format": _format,
    "String.pregMatch": _preg_match,
    "String.pregMatchGroup": _preg_match_group,  # extension: capture group n
    "String.pregReplace": _preg_replace,
    "String.pregSplit": _preg_split,
    "String.stripTags": "regexp_replace({0}, '<[^>]*>', '')",
    "String.htmlSpecialChars": (
        "replace(replace(replace(replace(replace({0}, '&', '&amp;'), "
        "'\"', '&quot;'), '''', '&#039;'), '<', '&lt;'), '>', '&gt;')"
    ),
    "String.crop": lambda args: (
        # Neos crop appends the suffix only when it actually crops
        f"CASE WHEN length({args[0]}) > ({args[1]}) "
        f"THEN substring({args[0]}, 1, {args[1]}) || {args[2]} "
        f"ELSE {args[0]} END"
        if len(args) == 3
        else f"substring({args[0]}, 1, {args[1]})"
    ),
    "String.repeat": "repeat({0}, {1})",
    "String.chunk": None,  # no scalar equivalent; register a UDF if needed
    "Math.round": "round({0})",
    "Math.floor": "floor({0})",
    "Math.ceil": "ceiling({0})",
    "Math.abs": "abs({0})",
    # variadic like their Eel counterparts (r11 review catch: the
    # str.format templates silently DROPPED surplus arguments)
    "Math.min": lambda args: args[0] if len(args) == 1 else f"least({', '.join(args)})",
    "Math.max": lambda args: args[0] if len(args) == 1 else f"greatest({', '.join(args)})",
    "Math.pow": "power({0}, {1})",
    "Math.sqrt": "sqrt({0})",
    "Math.random": "rand()",
    "Math.log": "ln({0})",
    "Math.exp": "exp({0})",
    "Math.sign": "sign({0})",
    "Math.trunc": "cast({0} as bigint)",
    "Date.now": "current_timestamp()",
    "Date.format": lambda args, literals: _date_format(args, literals),
    "Date.parse": "to_timestamp({0})",
    "Date.year": "year({0})",
    "Date.month": "month({0})",
    "Date.dayOfMonth": "dayofmonth({0})",
    "Date.hour": "hour({0})",
    "Date.minute": "minute({0})",
    "Date.second": "second({0})",
    "Date.dayOfWeek": "dayofweek({0})",
    "Date.add": "({0} + make_interval(0, 0, 0, {1}, 0, 0, 0))",  # add days
    # Date.create(value[, timezone]): PHP's DateTime interprets a naive
    # string in the given zone — to_utc_timestamp converts that wall time
    # to the UTC instant (the session runs in UTC).
    "Date.create": lambda args: (
        f"to_utc_timestamp(to_timestamp({args[0]}), {args[1]})"
        if len(args) == 2
        else f"to_timestamp({args[0]})"
    ),
    "Array.join": "array_join({0}, {1})",
    "Array.length": "size({0})",
    "Array.first": "element_at({0}, 1)",
    "Array.last": "element_at({0}, -1)",
    "Array.concat": lambda args: f"concat({', '.join(args)})",
    "Array.indexOf": "(array_position({0}, {1}) - 1)",
    "Array.push": "array_append({0}, {1})",
    "Array.slice": _array_slice,
    "Array.sort": "array_sort({0})",
    "Array.reverse": "reverse({0})",
    "Array.unique": "array_distinct({0})",
    "Array.filter": None,  # closure arg; register a UDF if needed
    "Json.stringify": "to_json({0})",
}


def register_helper(name: str, template: str | Callable[[list[str]], str]) -> None:
    """Register a custom Eel helper (e.g. ``Some.Custom.Eelhelper``).

    ``template`` is a Spark-SQL format string over translated args, or a
    callable. To back it with Python, ``spark.udf.register("f", fn, rtype)``
    and pass ``"f({0})"`` — the reference's custom-helper extension point
    (``README.md:240``) mapped to Spark's UDF registry.
    """
    _HELPERS[name] = template


class EelTranslationError(ValueError):
    pass


def _protect_strings(expr: str) -> tuple[str, list[str]]:
    """Pull string literals out so operator rewrites can't touch them.

    Double-quoted Eel strings become single-quoted SQL strings.
    """
    literals: list[str] = []

    def grab(match: re.Match) -> str:
        text = match.group(0)
        if text.startswith('"'):
            inner = text[1:-1].replace("\\\"", '"').replace("'", "''")
            text = f"'{inner}'"
        literals.append(text)
        return f"\x00{len(literals) - 1}\x00"

    out = re.sub(_STRING_LIT + r'|"(?:[^"\\]|\\.)*"', grab, expr)
    return out, literals


def _restore_strings(expr: str, literals: list[str]) -> str:
    return re.sub(r"\x00(\d+)\x00", lambda m: literals[int(m.group(1))], expr)


def _translate_helpers(expr: str, literals: list[str]) -> str:
    """Rewrite ``Namespace.helper(args)`` calls via the registry, innermost
    first so nested calls resolve. ``literals`` is the protected-string
    pool — helper callables declaring a second parameter receive it so
    they can rewrite literal arguments (e.g. PHP preg patterns)."""
    call_re = re.compile(r"\b([A-Z][A-Za-z0-9]*(?:\.[A-Za-z][A-Za-z0-9]*)+)\(")

    def find_call(s: str) -> tuple[int, int, str, list[str]] | None:
        m = call_re.search(s)
        if not m:
            return None
        name = m.group(1)
        # bracket depth counts too: commas inside an array-literal arg
        # ([a, b]) must not split the argument list
        depth, i = 1, m.end()
        args, start = [], m.end()
        while i < len(s) and depth:
            c = s[i]
            if c in "([":
                depth += 1
            elif c in ")]":
                depth -= 1
                if depth == 0:
                    break
            elif c == "," and depth == 1:
                args.append(s[start:i].strip())
                start = i + 1
            i += 1
        if depth:
            raise EelTranslationError(f"Unbalanced parentheses in: {s}")
        tail = s[start:i].strip()
        if tail:
            args.append(tail)
        return m.start(), i + 1, name, args

    import inspect

    while True:
        found = find_call(expr)
        if found is None:
            return expr
        begin, end, name, args = found
        template = _HELPERS.get(name)
        if template is None:
            raise EelTranslationError(
                f'No translation for Eel helper "{name}" — register one with '
                f"register_helper(), optionally backed by spark.udf.register()"
            )
        args = [_translate_helpers(a, literals) for a in args]
        if callable(template):
            if len(inspect.signature(template).parameters) >= 2:
                rendered = template(args, literals)
            else:
                rendered = template(args)
        else:
            idxs = {int(m) for m in re.findall(r"{(\d+)}", template)}
            expected = (max(idxs) + 1) if idxs else 0
            if len(args) != expected:
                # str.format silently IGNORES surplus positional args
                # (r11 review catch: Math.min(1,2,3) rendered
                # least(1, 2), dropping an operand with no error)
                raise EelTranslationError(
                    f'Eel helper "{name}" takes {expected} argument(s), '
                    f"got {len(args)}"
                )
            rendered = template.format(*args)
        expr = expr[:begin] + rendered + expr[end:]


def _rewrite_array_literals(expr: str) -> str:
    """Eel array literals ``[a, b]`` → Spark ``array(a, b)``. A ``[``
    directly following an identifier / ``)`` / ``]`` is indexing
    (``record.tags[0]``) and is left alone."""
    out, i, n = [], 0, len(expr)
    while i < n:
        c = expr[i]
        if c == "[":
            prev = "".join(out).rstrip()
            is_index = bool(prev) and (prev[-1].isalnum() or prev[-1] in ")]_\x00")
            if not is_index:
                depth, j = 1, i + 1
                while j < n and depth:
                    if expr[j] in "([":
                        depth += 1
                    elif expr[j] in ")]":
                        depth -= 1
                    j += 1
                if depth:
                    raise EelTranslationError(f"Unbalanced brackets in: {expr}")
                inner = _rewrite_array_literals(expr[i + 1 : j - 1])
                out.append(f"array({inner})")
                i = j
                continue
        out.append(c)
        i += 1
    return "".join(out)


# boundaries that end a '+' chain: logical/comparison operators, commas,
# and CASE keywords (ternaries are already CASE-form when this runs)
_SEGMENT_RE = re.compile(
    r"(\bAND\b|\bOR\b|\bNOT\b|\bCASE\b|\bWHEN\b|\bTHEN\b|\bELSE\b|\bEND\b"
    r"|,|<>|<=|>=|=|<|>)"
)

# SQL keywords that may directly precede a '(' — such a paren is a
# grouping paren, NOT a function-call argument list, even though the
# keyword ends in an identifier character.
_SQL_KEYWORDS = {"WHEN", "THEN", "ELSE", "AND", "OR", "NOT", "CASE", "END"}


def _rewrite_plus_concat(expr: str) -> str:
    """Eel ``+`` concatenates when an operand is a string. After string
    literals are protected as \\x00N\\x00 tokens, any ``+`` chain touching
    one becomes ``||`` — applied recursively inside parentheses and
    per-segment between logical/comparison operators and CASE branches,
    so ``record.n + 1 = 2 AND record.s + "x" = "y"`` converts only the
    second chain. (Spark gives ``+`` and ``||`` the same precedence
    level, so the in-place swap preserves structure.) A *grouping* paren
    that concatenates counts as stringy for its enclosing chain — but a
    function-call argument list (a ``(`` directly following an
    identifier, e.g. the already-translated ``cast('5' as int)``) does
    NOT: a string literal inside a call's arguments says nothing about
    the call's result type, so ``record.n + String.toInteger("5")``
    stays numeric addition. The remaining ambiguity is inherent to
    translation-time type blindness: a call that *does* return a string
    (``record.s + String.format("%s", [x])``) also stays ``+`` — concat
    against helper results needs an explicit string operand or quotes.
    Attribute-only concat like ``record.a + record.b`` on string columns
    still needs helpers or explicit quotes — column types aren't known
    at translation time."""
    groups: list[str] = []
    stringy: set[int] = set()

    def extract_parens(s: str) -> str:
        out, depth, start = [], 0, 0
        is_call_args = False
        for i, c in enumerate(s):
            if c == "(":
                if depth == 0:
                    head = s[start:i]
                    out.append(head)
                    # A '(' directly after an identifier is a call-arg
                    # list — unless that "identifier" is a SQL keyword
                    # (THEN/ELSE/AND/... all end in an alnum char), in
                    # which case it is a grouping paren and its string
                    # content must mark the enclosing '+' chain.
                    tail = re.search(r"([A-Za-z_`][A-Za-z0-9_`]*)?\s*$", head)
                    word = tail.group(1) if tail and tail.group(1) else ""
                    is_call_args = bool(word) and (
                        word.upper() not in _SQL_KEYWORDS
                    )
                    start = i + 1
                depth += 1
            elif c == ")":
                depth -= 1
                if depth == 0:
                    body = rewrite(s[start:i])
                    idx = len(groups)
                    groups.append(body)
                    if not is_call_args and ("\x00" in body or "||" in body):
                        stringy.add(idx)
                    out.append(f"\x01{idx}\x01")
                    start = i + 1
        out.append(s[start:])
        return "".join(out)

    def is_stringy(part: str) -> bool:
        if "\x00" in part:
            return True
        return any(
            int(m.group(1)) in stringy for m in re.finditer(r"\x01(\d+)\x01", part)
        )

    def rewrite(s: str) -> str:
        top = extract_parens(s)
        pieces = _SEGMENT_RE.split(top)
        for k in range(0, len(pieces), 2):  # even indices are operand segments
            seg = pieces[k]
            if "+" not in seg:
                continue
            parts, depth, start = [], 0, 0
            for i, c in enumerate(seg):  # bracket-aware: skip index exprs
                if c == "[":
                    depth += 1
                elif c == "]":
                    depth -= 1
                elif c == "+" and depth == 0:
                    parts.append(seg[start:i])
                    start = i + 1
            parts.append(seg[start:])
            if len(parts) > 1 and any(is_stringy(p) for p in parts):
                # left-to-right fold (r11 review catch): Eel evaluates
                # 1 + 2 + "x" as (1+2)+"x" = '3x'; converting the WHOLE
                # chain to || gave '12x'. Consecutive NUMERIC-LITERAL
                # operands before the first stringy one keep arithmetic
                # + — their types are statically known, unlike columns.
                k2 = 0
                while k2 < len(parts) and re.fullmatch(
                    r"\s*-?\d+(\.\d+)?\s*", parts[k2]
                ):
                    k2 += 1
                head = [p.strip() for p in parts[:k2]]
                rest = [p.strip() for p in parts[k2:]]
                if len(head) >= 2:
                    chain = ["(" + " + ".join(head) + ")"] + rest
                else:
                    chain = head + rest
                pieces[k] = " " + " || ".join(chain) + " "
        return "".join(pieces)

    result = rewrite(expr)
    # restore paren groups (innermost placeholders restore through nesting)
    while "\x01" in result:
        result = re.sub(
            r"\x01(\d+)\x01", lambda m: "(" + groups[int(m.group(1))] + ")", result
        )
    return result


def _rewrite_ternary(expr: str) -> str:
    """``cond ? a : b`` → ``CASE WHEN … END``, at every paren depth:
    group bodies are rewritten recursively first (a ternary wrapped in
    parens, or used as an operand, sits at depth ≥ 1), then the first
    top-level ``?`` splits this level. The else-branch recurses, so
    right-chained ``c1 ? x : c2 ? y : z`` resolves; a *bare* nested
    ternary in the then-branch needs parentheses (as in Eel style)."""
    if "?" in expr:
        # rewrite inside top-level parenthesized AND bracketed groups
        # first (r11 review catch: a ternary inside an array literal —
        # [cond ? a : b, c] — was skipped entirely because the
        # top-level split counts '[' as depth, yielding unparseable SQL)
        out: list[str] = []
        depth, last, start = 0, 0, 0
        opener = "("
        for i, c in enumerate(expr):
            if c in "([":
                if depth == 0:
                    out.append(expr[last:i])
                    start = i + 1
                    opener = c
                depth += 1
            elif c in ")]":
                depth -= 1
                if depth == 0:
                    closer = ")" if opener == "(" else "]"
                    # comma-split BEFORE recursing: the group may be an
                    # argument/element list, and a ternary binds within
                    # its own element — rewriting the whole body would
                    # swallow the following elements into the ELSE
                    body = expr[start:i]
                    parts, d2, st = [], 0, 0
                    for j, c2 in enumerate(body):
                        if c2 in "([":
                            d2 += 1
                        elif c2 in ")]":
                            d2 -= 1
                        elif c2 == "," and d2 == 0:
                            parts.append(body[st:j])
                            st = j + 1
                    parts.append(body[st:])
                    out.append(
                        opener
                        + ", ".join(_rewrite_ternary(p2) for p2 in parts)
                        + closer
                    )
                    last = i + 1
        out.append(expr[last:])
        expr = "".join(out)
    q = expr.find("?")
    if q == -1 or expr.find(":", q) == -1:
        return expr
    # split on the first top-level '?' and its matching ':'
    depth = 0
    for i, c in enumerate(expr):
        if c in "([":
            depth += 1
        elif c in ")]":
            depth -= 1
        elif c == "?" and depth == 0:
            cond = expr[:i]
            rest = expr[i + 1 :]
            d2 = 0
            for j, c2 in enumerate(rest):
                if c2 in "([":
                    d2 += 1
                elif c2 in ")]":
                    d2 -= 1
                elif c2 == ":" and d2 == 0:
                    then, other = rest[:j], rest[j + 1 :]
                    return (
                        f"CASE WHEN {cond.strip()} THEN {then.strip()} "
                        f"ELSE {_rewrite_ternary(other.strip())} END"
                    )
            break
    return expr


def translate_eel(rule: str, variables: dict[str, str] | None = None) -> str:
    """Translate an Eel expression ``${…}`` to a Spark SQL expression string.

    ``variables`` maps extra context-variable names to column prefixes
    (the reference injects e.g. ``nodeData``,
    ``ContentRepositoryTarget.php:296``); ``record`` always maps to the
    bare row, so ``record.foo`` → column ``foo``.
    """
    m = _EEL_RE.match(rule)
    if not m:
        raise EelTranslationError(f"Not an Eel expression: {rule}")
    expr = m.group("exp")

    expr, literals = _protect_strings(expr)
    # logical operators BEFORE '+'→'||' rewriting ('||' means OR in Eel)
    expr = re.sub(r"&&", " AND ", expr)
    expr = re.sub(r"\|\|", " OR ", expr)
    expr = re.sub(r"==", " = ", expr)
    expr = re.sub(r"!=", " <> ", expr)  # before '!' so it isn't eaten by NOT
    expr = re.sub(r"!(?![=])", " NOT ", expr)
    expr = _rewrite_ternary(expr)
    expr = _rewrite_array_literals(expr)
    expr = _translate_helpers(expr, literals)
    # context variables: record.foo → `foo`; extra vars → prefixed columns
    expr = re.sub(r"\brecord\.([A-Za-z_][A-Za-z0-9_]*)", r"`\1`", expr)
    for var, prefix in (variables or {}).items():
        expr = re.sub(
            rf"\b{re.escape(var)}\.([A-Za-z_][A-Za-z0-9_]*)",
            rf"`{prefix}`.\1" if prefix else r"`\1`",
            expr,
        )
    expr = _rewrite_plus_concat(expr)
    return _restore_strings(expr, literals).strip()
