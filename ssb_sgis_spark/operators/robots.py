"""robots.txt (RFC 9309) parsing + crawl-politeness filtering.

Every Common-Crawl-style pipeline gates its page table on the Robots
Exclusion Protocol; this is that gate as DataFrame operators:

* :func:`parse_robots` — the RFC 9309 parser as an Arrow-batched
  ``mapInPandas`` kernel (a robots file is a stateful line machine —
  User-agent lines STACK onto one group until the first rule line, so
  this is genuinely sequential per document and earns its Python
  kernel).  Handles: group stacking, case-insensitive directives and
  product tokens, ``#`` comments, empty-pattern rules (ignored per the
  RFC), ``*`` wildcards and the ``$`` end anchor, and most-specific
  user-agent group selection (exact token beats ``*``; no group ⇒
  allow-all).
* :func:`apply_robots` — the access decision as a JOIN, not a UDF: the
  per-host rules table (tiny — one row per rule) broadcasts against the
  pages, candidate matches evaluate in codegen (``startswith`` for
  literal rules, ``regexp_like`` for wildcard rules — the regex is
  PRE-TRANSLATED once per rule on the rules side, never per page), and
  the RFC's longest-match / allow-wins-ties rule is one ``max_by`` over
  a (specificity, allow) struct.  Pages on hosts with no matching rule
  (or no robots at all) default to allowed via the left join.

Scale shape at 10^12 pages: the pages side never shuffles — rules
broadcast (a real web crawl has ~10^8 hosts × a handful of rules; if
that outgrows the broadcast ceiling the same plan runs as a shuffle
hash join on host, still one exchange of the SMALL columns only — url
path + host, never html).  The parse side is |hosts|-sized, not
|pages|-sized.

The synthetic corpus needs robots files: :func:`robots_txt_df` builds
one per site from a closed-form law (decoy group for another agent,
modular Disallow/Allow pairs so the longest-match tie-break is actually
exercised), mirrored in the driver oracle by deriving the DECISIONS
from the law directly — the oracle never parses, so Spark's parser is
checked against an independent derivation.

Reference parity: none — webtext surface (BASELINE input_hint), RFC
9309 is the public spec this implements.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "robots_txt_df",
    "parse_robots",
    "apply_robots",
    "RULES_SCHEMA",
]

RULES_SCHEMA = (
    "host string, rule string, allow boolean, spec int, has_wild boolean, rx string"
)


# ------------------------------------------------------------ synthesis
def robots_txt_df(spark, n_sites: int = 1000) -> DataFrame:
    """One deterministic robots.txt per ``site{s}.no`` host:

    * every file has a decoy ``User-agent: otherbot / Disallow: /``
      group (must be ignored for any other agent) and comment + blank
      lines;
    * ``s % 3 == 0`` → the ``*`` group disallows ``/p/`` but re-allows
      the longer ``/p/7`` (longest-match + allow-tie exercise);
    * ``s % 5 == 0`` → the ``*`` group disallows ``/l/``;
    * every ``*`` group carries an empty ``Disallow:`` line (ignored
      per RFC 9309).
    """
    s = F.col("site")
    txt = F.concat(
        F.lit("# synthetic robots law\nUser-agent: otherbot\nDisallow: /\n\n"),
        F.lit("User-Agent: *\nDisallow:\n"),
        F.when(s % 3 == 0, F.lit("Disallow: /p/\nAllow: /p/7\n")).otherwise(F.lit("")),
        F.when(s % 5 == 0, F.lit("disallow: /l/\n")).otherwise(F.lit("")),
    )
    return (
        spark.range(n_sites)
        .select(F.col("id").cast("int").alias("site"))
        .select(
            F.concat(F.lit("site"), s.cast("string"), F.lit(".no")).alias("host"),
            txt.alias("robots_txt"),
        )
    )


# ------------------------------------------------------------ parser
def _translate(pattern: str) -> tuple[bool, str]:
    """RFC pattern → (has_wildcard, anchored Java/RE2-safe regex).
    ``*`` matches any char run; a trailing ``$`` anchors the end."""
    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = "".join(".*" if c == "*" else re.escape(c) for c in body)
    return (("*" in body) or anchored), "^" + rx + ("$" if anchored else "")


def parse_robots_text(txt: str, agent: str) -> list[tuple[str, bool, int, bool, str]]:
    """Scalar RFC 9309 parse: the rule list of the most specific group
    for ``agent`` — exact product-token match wins over ``*``; absent
    both ⇒ no rules (allow all).  Returns
    ``[(rule, allow, spec, has_wild, rx), ...]``."""
    agent = agent.lower()
    groups: list[tuple[set, list]] = []  # (agent tokens, rules)
    cur_agents: set | None = None
    in_group_header = False
    for raw in txt.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not in_group_header:
                cur_agents = set()
                groups.append((cur_agents, []))
                in_group_header = True
            cur_agents.add(val.lower())
        elif key in ("allow", "disallow"):
            in_group_header = False
            if cur_agents is None or not val:  # rule before any group / empty pattern
                continue
            groups[-1][1].append((val, key == "allow"))
        else:  # crawl-delay, sitemap, unknown — end the header run
            in_group_header = False
    chosen = None
    for agents, rules in groups:
        if agent in agents:
            chosen = rules
            break
    if chosen is None:
        for agents, rules in groups:
            if "*" in agents:
                chosen = rules
                break
    out = []
    for pattern, allow in chosen or []:
        has_wild, rx = _translate(pattern)
        out.append((pattern, allow, len(pattern), has_wild, rx))
    return out


def parse_robots(
    df: DataFrame,
    agent: str = "sgisbot",
    txt_col: str = "robots_txt",
    host: str = "host",
) -> DataFrame:
    """Distributed parse: (host, robots_txt) → one row per applicable
    rule ``(host, rule, allow, spec, has_wild, rx)``.  Arrow-batched;
    hosts with no applicable rules emit nothing (the decision join's
    left side defaults them to allowed)."""

    def kernel(it):
        import pandas as pd

        for pdf in it:
            rows = []
            for h, t in zip(pdf[host], pdf[txt_col]):
                for rule, allow, spec, hw, rx in parse_robots_text(str(t), agent):
                    rows.append((h, rule, allow, spec, hw, rx))
            if rows:
                yield pd.DataFrame(
                    rows,
                    columns=["host", "rule", "allow", "spec", "has_wild", "rx"],
                )

    return df.select(host, txt_col).mapInPandas(kernel, schema=RULES_SCHEMA)


# ------------------------------------------------------------ decision
def apply_robots(
    pages: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    broadcast_rules: bool = True,
) -> DataFrame:
    """RFC 9309 access decision per page: adds ``allowed`` (boolean).

    Candidates = broadcast equi-join on host; match = codegen
    startswith / regexp_like on the PATH; decision = ``max_by(allow,
    (spec, allow))`` — longest rule wins, allow wins ties; no match or
    no rules ⇒ allowed."""
    from ssb_sgis_spark.functions.url import host_col, path_col

    r = F.broadcast(rules) if broadcast_rules else rules
    keyed = pages.withColumn("_host", host_col(F.col(url_col))).withColumn(
        "_path", path_col(F.col(url_col))
    )
    cand = keyed.join(r, keyed["_host"] == r["host"], "left")
    hit = F.when(
        F.col("rule").isNull(), F.lit(None).cast("boolean")
    ).otherwise(
        F.when(F.col("has_wild"), F.regexp_like(F.col("_path"), F.col("rx")))
        .otherwise(F.col("_path").startswith(F.col("rule")))
    )
    matched = cand.withColumn("_hit", hit)
    decided = (
        matched.groupBy(*[F.col(c) for c in pages.columns])
        .agg(
            F.max_by(
                F.col("allow"),
                F.when(F.col("_hit"), F.struct(F.col("spec"), F.col("allow"))),
            ).alias("_best")
        )
        .withColumn("allowed", F.coalesce(F.col("_best"), F.lit(True)))
        .drop("_best")
    )
    return decided
