"""Physical-plan linter: the pre-flight check a 100 TB run starts with.

``.explain("formatted")`` tells an expert what a plan will do; this
module turns the same text into machine-checkable findings so a CI gate
(or the ``lint`` CLI subcommand) can refuse plans that would melt a
cluster. The checks encode the engine's own scale rules (SCALE.md):

- **error** ``cartesian-join``: a ``CartesianProduct`` scales O(|L|x|R|)
  — at any real size this is the single worst plan shape. (The exact
  brute-force ANN baseline crossJoins a BROADCAST side deliberately;
  broadcast nested loop is reported as a warning instead.)
- **error** ``row-python-udf``: ``BatchEvalPython`` is a per-row
  Python round trip — 10-100x slower than Arrow batching; the engine's
  rule is zero row UDFs (VERDICT r2 audited this).
- **warn** ``bnl-join``: ``BroadcastNestedLoopJoin`` is fine for a tiny
  broadcast side (exact-baseline crossJoins, non-equi range joins) but
  is quadratic in the probe side — flagged so the author confirms the
  broadcast side is genuinely bounded.
- **warn** ``exchange-count``: more shuffles than the caller's budget.
- **info** ``python-boundary``: Arrow-batched pandas boundaries
  (``ArrowEvalPython``/``FlatMapGroupsInPandas``/``MapInPandas``/
  UDTFs) — legitimate, but each one caps whole-stage codegen, so they
  are surfaced for review.
- **info** ``scan``: every file scan with its ReadSchema width and
  whether any filter was pushed — the reader checks nothing scans 40
  columns to serve a 2-column projection.

Driver-side cost: one ``explainString`` round trip; nothing is executed.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame


@dataclass
class Finding:
    severity: str  # "error" | "warn" | "info"
    code: str
    detail: str

    def __str__(self) -> str:  # CLI-friendly
        return f"[{self.severity}] {self.code}: {self.detail}"


def _plan_text(df: DataFrame) -> str:
    # df.explain prints; capture it (the public API — the JVM-side
    # explainString overload takes an ExplainMode object, not a string).
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return buf.getvalue()


def top_level_fields(struct_body: str) -> int:
    """Count ReadSchema struct fields at nesting depth 0: a nested field
    like ``a:struct<b:int,c:int>`` is ONE column read, not three (a plain
    comma split overcounts nested schemas)."""
    depth, fields = 0, 0
    for ch in struct_body:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        elif ch == "," and depth == 0:
            fields += 1
    return fields + 1 if struct_body.strip() else 0


def lint_plan(df: DataFrame, *, max_exchanges: int | None = None) -> list[Finding]:
    """Lint a DataFrame's physical plan; returns findings, worst first."""
    text = _plan_text(df)
    findings: list[Finding] = []

    if re.search(r"CartesianProduct", text):
        findings.append(
            Finding("error", "cartesian-join",
                    "CartesianProduct: O(|L|x|R|) pair materialization")
        )
    # \b after "Python" keeps BatchEvalPythonUDTF (a lateral-join UDTF,
    # reported as python-boundary below) from matching the row-UDF check.
    if re.search(r"\bBatchEvalPython\b", text):
        findings.append(
            Finding("error", "row-python-udf",
                    "BatchEvalPython: per-row Python UDF in the plan")
        )
    if re.search(r"BroadcastNestedLoopJoin", text):
        findings.append(
            Finding("warn", "bnl-join",
                    "BroadcastNestedLoopJoin: confirm the broadcast side is "
                    "bounded (exact baselines / non-equi joins only)")
        )

    # Count detail headers only ("(N) Exchange"): formatted explain prints
    # every node twice (tree line + detail block), so a bare \bExchange\b
    # count would double the real shuffle count.
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", text, re.MULTILINE))
    if max_exchanges is not None and n_exchanges > max_exchanges:
        findings.append(
            Finding("warn", "exchange-count",
                    f"{n_exchanges} shuffle exchanges (budget {max_exchanges})")
        )

    for op in ("ArrowEvalPython", "FlatMapGroupsInPandas", "MapInPandas",
               "FlatMapGroupsInPandasWithState", "BatchEvalPythonUDTF"):
        if re.search(rf"\b{op}\b", text):
            findings.append(
                Finding("info", "python-boundary",
                        f"{op}: Arrow-batched Python stage (caps codegen)")
            )

    # Scan census: detail-header anchored ("(N) Scan parquet ...") so each
    # scan counts once. The ReadSchema/PushedFilters search is bounded to
    # THIS scan's detail block — i.e. the text before the next "(N) "
    # header — not a fixed window, which could leak the NEXT scan's
    # schema/filters into a long or ReadSchema-less block.
    for m in re.finditer(r"^\(\d+\) Scan (\w+) ([^\n]*)", text, re.MULTILINE):
        fmt = m.group(1)
        tail = text[m.end():]
        next_hdr = re.search(r"^\(\d+\) ", tail, re.MULTILINE)
        block = tail[: next_hdr.start()] if next_hdr else tail
        # ReadSchema prints on one (possibly truncated) line; capture to
        # end-of-line and count depth-0 commas only.
        schema_m = re.search(r"ReadSchema: struct<([^\n]*)", block)
        pushed_m = re.search(r"PushedFilters: \[([^\]]*)\]", block)
        width = top_level_fields(schema_m.group(1)) if schema_m else 0
        pushed = bool(pushed_m and pushed_m.group(1).strip())
        findings.append(
            Finding("info", "scan",
                    f"{fmt} scan: {width} columns read, "
                    f"pushed filters: {'yes' if pushed else 'none'}")
        )

    order = {"error": 0, "warn": 1, "info": 2}
    findings.sort(key=lambda f: order[f.severity])
    return findings


_CAST_DEC = re.compile(r'cast\("decimal|AS DECIMAL\(\d', re.I)
# Non-exact-double producers: one libm/sqrt output inside a decimal
# cast's neighborhood means the cast is rounding an irrational value
# under the engine's own rule (divergence class 6, SCALE.md).
_RISK = re.compile(
    r"\bsqrt\b|\bln\(|\blog\b|\blog2\b|\blog10\b|\bexp\(|\bpow\b"
    r"|F\.pow|\bF\.exp\b|\bcbrt\b|\batan2?\b|\basin\b|\bacos\b",
    re.I,
)
# stable_round_sql's expansion fingerprint (some oracles interpolate the
# helper, whose output text carries the guard + floor formula instead
# of the helper's name). Matched on the CAST LINE ITSELF, not the
# neighborhood: the expansion always wraps the casted expression, so it
# shares the line; a window match would let a genuinely naked cast
# adjacent to a protected site share its window and slip through
# (advisor r9 false-negative finding). ±2 lines, not the cast line
# alone: the expansion is one very long line (or a short wrapped SQL
# literal) and the closing ``AS DECIMAL(p,s))`` lands a line or two
# below the guard. The contiguous guard text is used rather than three
# loose substrings for the same reason.
_EXPANDED_GUARD = "IS NULL OR isnan("


def lint_decimal_casts(
    package_root: str, *, window: int = 4
) -> list[Finding]:
    """Source-level lint for divergence class 6 (SCALE.md): every
    ``cast("decimal`` / ``AS DECIMAL(`` site whose ±``window``-line
    neighborhood contains a non-exact-double producer (sqrt / ln / log /
    exp / pow / ...) must also contain ``stable_round`` (the helper
    name, its ``_sql`` twin, or the expanded guard+floor fingerprint)
    or an explicit ``decimal-exempt:`` marker comment. Exact operands
    (integer counts, 2dp cents cast with scale margin, already-decimal
    values) carry no risk token and are not flagged.

    Six cross-engine float-divergence classes were each found LIVE at a
    new scale factor; this makes the raw-irrational-cast class (the
    sixth — five latent sites fixed in one audit) impossible to commit
    unnoticed. Regression fixtures: tests/test_decimal_cast_lint.py.
    """
    import glob as _glob
    import os as _os

    findings: list[Finding] = []
    for path in sorted(
        _glob.glob(_os.path.join(package_root, "**", "*.py"), recursive=True)
    ):
        lines = open(path).read().splitlines()
        for i, ln in enumerate(lines):
            if not _CAST_DEC.search(ln):
                continue
            neigh = "\n".join(lines[max(0, i - window) : i + window + 1])
            if "stable_round" in neigh or "decimal-exempt:" in neigh:
                continue
            if _EXPANDED_GUARD in "\n".join(lines[max(0, i - 2) : i + 3]):
                continue
            if _RISK.search(neigh):
                findings.append(
                    Finding(
                        "error",
                        "raw-irrational-decimal-cast",
                        f"{_os.path.relpath(path, package_root)}:{i + 1}: "
                        f"decimal cast near a libm/sqrt producer without "
                        f"stable_round (class 6): {ln.strip()[:80]}",
                    )
                )
    return findings


# A parenthesized expression cast to a SCALED decimal. Scale >= 1 is the
# hazard: Spark computes the inner product at the operands' natural
# widths first, and a decimal(p1,s1)*decimal(p2,s2) whose result
# precision exceeds 38 gets its SCALE silently narrowed
# (precision-loss rounding) BEFORE the outer cast can ask for more —
# e.g. decimal(19,6) squared lands at decimal(38,11), so a
# .cast("decimal(38,12)") of it re-widens an already-rounded value.
# DuckDB's DECIMAL products are exact, so the two engines diverge on
# exactly the values whose 12th decimal digit is nonzero (advisor r9,
# ext_brier_decomp / ext_levene). Scale-0 targets are exempt: integer
# products either fit precision 38 exactly or keep scale 0 under
# adjustment — no hidden rounding.
_CAST_SCALED_DEC = re.compile(r'\)\s*\.cast\(\s*["\']decimal\(\d+,\s*[1-9]')


def lint_product_decimal_casts(
    package_root: str, *, join_lines: int = 12
) -> list[Finding]:
    """Source-level lint for the product-then-cast decimal hazard
    (divergence class 7, SCALE.md round 10): flag every Spark-side
    ``(<expr with *>).cast("decimal(p, s>=1)")`` site. The fix is to
    narrow the OPERANDS before multiplying (so the product type is
    exact), never to cast the product — e.g. ``diff.cast("decimal(8,6)")
    * diff.cast("decimal(8,6)")`` is decimal(17,12), exact. Groups
    containing ``stable_round`` are exempt: those are DOUBLE
    expressions quantized to n dp first, so the decimal cast of the
    quantized value is exact regardless of what the double math did.
    Other deliberate sites carry a ``product-exempt:`` marker comment
    within ±2 lines.
    Oracle-side SQL is not linted: DuckDB decimal products are exact
    (it errors on width overflow rather than narrowing), so the class
    is one-sided. Regression fixtures: tests/test_decimal_cast_lint.py.
    """
    import glob as _glob
    import os as _os

    findings: list[Finding] = []
    for path in sorted(
        _glob.glob(_os.path.join(package_root, "**", "*.py"), recursive=True)
    ):
        lines = open(path).read().splitlines()
        for i, ln in enumerate(lines):
            m = _CAST_SCALED_DEC.search(ln)
            if m is None:
                continue
            if "product-exempt:" in "\n".join(
                lines[max(0, i - 2) : i + 3]
            ):
                continue
            # Walk back from the ')' preceding .cast to its matching
            # '(' — joining up to `join_lines` preceding lines for
            # multi-line expressions — and test the group for '*'.
            text = "\n".join(lines[max(0, i - join_lines) : i]) + (
                "\n" if i else ""
            ) + ln
            close = len(text) - (len(ln) - m.start())
            depth, j = 0, close
            while j >= 0:
                if text[j] == ")":
                    depth += 1
                elif text[j] == "(":
                    depth -= 1
                    if depth == 0:
                        break
                j -= 1
            group = text[j + 1 : close] if j >= 0 else text[:close]
            # The group is exempt when it IS stable_round's argument
            # list (identifier directly before the open paren) or when
            # the quantizer is applied somewhere inside it.
            quantized = "stable_round" in group or (
                j >= 0 and text[:j].rstrip().endswith("stable_round")
            )
            if "*" in group and not quantized:
                findings.append(
                    Finding(
                        "error",
                        "product-scaled-decimal-cast",
                        f"{_os.path.relpath(path, package_root)}:{i + 1}: "
                        f"product cast to scaled decimal — Spark narrows "
                        f"the product scale BEFORE the cast (class 7); "
                        f"narrow the operands instead: {ln.strip()[:80]}",
                    )
                )
    return findings


def assert_clean(df: DataFrame, *, max_exchanges: int | None = None) -> list[Finding]:
    """Raise if the plan has any error-severity finding; returns all
    findings otherwise (the CI-gate form of ``lint_plan``)."""
    findings = lint_plan(df, max_exchanges=max_exchanges)
    errors = [f for f in findings if f.severity == "error"]
    if errors:
        raise AssertionError(
            "plan lint failed: " + "; ".join(str(e) for e in errors)
        )
    return findings
