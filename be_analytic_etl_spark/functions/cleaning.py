"""Brazilian-locale numeric normalization and string tidy ops.

Behavioral parity targets (reference file:line):

- ``br_number_str`` / ``br_number_to_double`` — `converter_para_numero`,
  ``/root/reference/main.py:531-582``. The branchy rules, replicated exactly:
    * trim; invalid tokens ('', 'nan', '-', '--', '---', 'ND', 'N/D',
      case-insensitive) -> NULL                       (main.py:537-540)
    * strip every char outside [0-9.,]                (main.py:543)
    * '.' AND ',' present  -> dots are thousands seps: drop dots, comma->dot
      ('1.234,56' -> '1234.56')                       (main.py:551-557)
    * ',' only             -> comma->dot ('1234,56' -> '1234.56')
                                                      (main.py:560-562)
    * 2+ dots, no comma    -> all dots are thousands seps: concat parts
      ('1.234.56' -> '123456'; NOT locale-correct but IS the reference
      behavior)                                       (main.py:565-569)
    * single dot / plain integer -> unchanged         (main.py:570-575)
    * anything that still isn't a clean number -> NULL
- ``strip_trailing_zeros`` — `limpar_celula`/`limpar_valor_final`,
  ``/root/reference/main.py:450-477,651-670``: '15.00'->'15', '15.50'->'15.5'
  (string cosmetics; moot once values are DoubleType, kept for CSV-surface
  parity).
- ``classify_service`` — `identificar_servico`, ``/root/reference/main.py:174-189``.
- ``extract_year`` — `extrair_ano_titulo`, ``/root/reference/main.py:192-199``.
- ``empty_to_null`` — ``/root/reference/connect_postgre.py:194-196``.
- ``normalize_identifier`` — ``/root/reference/connect_postgre.py:198-205``.

All are pure ``Column`` expressions: vectorized JVM-side, codegen-friendly,
and therefore scale-independent (no Python boundary per row).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column
from pyspark.sql import functions as F


def let(value: Column, body: Callable[[Column], Column]) -> Column:
    """Bind ``value`` ONCE and reference it many times in ``body``.

    Column expressions have no sharing: composing f(g(x)) where f references
    its argument k times inlines g's whole tree k times (CollapseProject),
    and the duplication multiplies through nesting — measured 10-100x
    slowdowns (codegen blows past JIT limits / interpreted re-evaluation).
    A single-element ``transform`` gives the expression language a let:
    the array [value] is evaluated once, the lambda variable is a cheap
    slot reference.

    >>> let(expensive_expr, lambda v: F.when(v > 0, v).otherwise(-v))
    """
    return F.element_at(F.transform(F.array(value), body), 1)

#: Tokens the reference treats as "no value" (main.py:537-540), lower-cased.
INVALID_TOKENS = ("", "nan", "-", "--", "---", "nd", "n/d")


def br_number_str(col: Column | str) -> Column:
    """Normalize a Brazilian-locale numeric string to canonical '1234.56' form.

    Returns a StringType column; unparseable input -> NULL. See module
    docstring for the exact branch semantics being matched.
    """
    c = F.col(col) if isinstance(col, str) else col
    s = F.trim(c)
    is_invalid_token = F.lower(s).isin(*INVALID_TOKENS) | s.isNull()

    stripped = F.regexp_replace(s, r"[^0-9.,]", "")
    has_dot = stripped.contains(".")
    has_comma = stripped.contains(",")
    n_dots = F.length(stripped) - F.length(F.regexp_replace(stripped, r"\.", ""))

    # both '.' and ',': dots = thousands separators, comma = decimal point
    both = F.translate(F.regexp_replace(stripped, r"\.", ""), ",", ".")
    # ',' only: comma = decimal point
    comma_only = F.translate(stripped, ",", ".")
    # 2+ dots, no comma: every dot is a thousands separator -> concat parts
    multi_dot = F.regexp_replace(stripped, r"\.", "")

    candidate = (
        F.when(has_dot & has_comma, both)
        .when(has_comma, comma_only)
        .when(n_dots >= 2, multi_dot)
        .otherwise(stripped)
    )
    # Valid canonical number: digits with at most one decimal point. Anything
    # else (multiple commas survived as dots, '', '.', etc.) -> NULL, matching
    # the reference's catch-all "return ''" failure path.
    valid = candidate.rlike(r"^[0-9]+(\.[0-9]+)?$|^\.[0-9]+$|^[0-9]+\.$")
    result = F.when(is_invalid_token | ~valid, F.lit(None)).otherwise(candidate)
    return result


def br_number_to_double(col: Column | str) -> Column:
    """Brazilian-locale numeric string -> DoubleType (NULL on unparseable).

    Same semantics as ``br_number_str(...).cast('double')`` but with a
    deliberately lean expression tree (the input is referenced 6 times, not
    ~18): when this function is composed over a non-trivial input expression,
    Catalyst's CollapseProject inlines that expression at every reference
    site, and a fat tree blows whole-stage-codegen methods past the JIT
    limit (measured 100x slowdown). Two reductions keep it lean:

    - the invalid-token check (main.py:537-540) is redundant: every invalid
      token ('', nan, -, ND, ...) strips to '' or a malformed numeric, which
      the final double cast maps to NULL anyway;
    - the two comma branches (main.py:551-562) unify: removing thousands
      dots is a no-op when none exist, so "has comma" alone selects
      `translate(strip_dots(x), ',', '.')`;
    - the validity regex is redundant with ``try_cast('double')`` (the
      candidate contains only [0-9.] at cast time; try_cast maps anything
      still malformed — '', '.', '1.2.3' — to NULL in ANSI and non-ANSI
      sessions alike, so the expression is session-config-independent).
    """
    c = F.col(col) if isinstance(col, str) else col
    stripped = F.regexp_replace(F.trim(c), r"[^0-9.,]", "")
    no_dots = F.translate(stripped, ".", "")
    n_dots = F.length(stripped) - F.length(no_dots)
    candidate = (
        F.when(stripped.contains(","), F.translate(no_dots, ",", "."))
        .when(n_dots >= 2, no_dots)
        .otherwise(stripped)
    )
    return candidate.try_cast("double")


def strip_trailing_zeros(col: Column | str) -> Column:
    """String-level decimal tidy: '15.00'->'15', '15.50'->'15.5'.

    Only touches strings that are purely ``digits.digits``; everything else
    passes through unchanged (reference guard at main.py:454-462).
    """
    c = F.col(col) if isinstance(col, str) else col
    is_decimal = c.rlike(r"^[0-9]+\.[0-9]+$")
    tidied = F.regexp_replace(
        F.regexp_replace(c, r"^([0-9]+)\.0+$", "$1"),  # 15.00 -> 15
        r"^([0-9]+\.[0-9]*?)0+$",  # 15.50 -> 15.5
        "$1",
    )
    return F.when(is_decimal, tidied).otherwise(c)


def classify_service(title: Column | str) -> Column:
    """First-match service tag from a resource title: SCM / SMP / STFC / OUTROS."""
    c = F.col(title) if isinstance(title, str) else title
    u = F.upper(F.coalesce(c, F.lit("")))
    return (
        F.when(u.contains("SCM"), F.lit("SCM"))
        .when(u.contains("SMP"), F.lit("SMP"))
        .when(u.contains("STFC"), F.lit("STFC"))
        .otherwise(F.lit("OUTROS"))
    )


def extract_year(title: Column | str) -> Column:
    """First 4-digit run in the string as IntegerType; NULL if absent."""
    c = F.col(title) if isinstance(title, str) else title
    y = F.regexp_extract(c, r"(\d{4})", 1)
    return F.when(y == "", F.lit(None)).otherwise(y).cast("int")


def empty_to_null(col: Column | str) -> Column:
    """Map empty / whitespace-only strings to NULL (load-boundary semantics)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(F.trim(c) == "", F.lit(None)).otherwise(c)


def normalize_identifier(name: str) -> str:
    """Column-name normalization: spaces/hyphens/dots -> '_', lowercase.

    Driver-side (schema op, not a data op).
    """
    import re

    return re.sub(r"[ .\-]", "_", name.strip()).lower()
