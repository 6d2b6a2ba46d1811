#!/usr/bin/env python3
"""One-shot refactoring tool: move query entries out of SparkEntry.queriesBase
into a new tier object (the StatsQueries/StreamQueries pattern), VERBATIM.

Usage: python3 tools/extract_queries.py <ObjectName> <scaladoc one-liner> q_a q_b ...

Each entry's span runs from the comment block immediately preceding its
`"q_x" ->` line to the line before the next entry (or the map's closing
parenthesis). The entries are removed from SparkEntry.scala and written into
src/main/scala/graft/<ObjectName>.scala with the same imports SparkEntry
uses; the caller wires `++ <ObjectName>.queries` into SparkEntry.queries by
hand (one visible line, so the diff shows the contract change explicitly).
ContractSpec's key-collision check guards the move.

CAVEATS (advisor, round 14) — this is a one-shot provenance tool, not a
robust refactorer: HEADER hardcodes one fixed import set (a moved entry
needing an import SparkEntry gained later won't compile until you add it
to the new module by hand), and the span heuristic assumes entries sit at
exactly 4-space indent with their comments attached directly above. ALWAYS
`sbt compile && sbt test` after running it; a mis-sliced span fails the
compile, a dropped comment is caught in review.
"""
import re
import sys

SRC = "src/main/scala/graft/SparkEntry.scala"

HEADER = """package graft

import org.apache.spark.sql.{{DataFrame, SparkSession}}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.engine.{{Catalog, Checks, Ops, Sinks}}
import graft.llm.{{Bpe, Classify, Dedup, Pq, Similarity, Spectral, TextStats, Unigram}}
import graft.multimodal.Multimodal
import graft.streaming.EventStreams
import SparkEntry.{{cat, scratch, withPathLock, dirFingerprint}}

/** {doc}
  *
  * Extracted verbatim from [[SparkEntry.queriesBase]] — same keys, same
  * closures, zero behavior change; the matching oracle SQL stays in
  * [[OracleSql]]. */
object {name} {{

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

{entries}  )
}}
"""


def main():
    obj, doc = sys.argv[1], sys.argv[2]
    keys = set(sys.argv[3:])
    lines = open(SRC).read().split("\n")
    # locate queriesBase region
    start = next(i for i, l in enumerate(lines)
                 if "lazy val queriesBase" in l)
    # entries at indent 4
    entry_re = re.compile(r'^    "(q_\w+)" ->')
    starts = []  # (line_idx, key)
    close = None
    for i in range(start + 1, len(lines)):
        m = entry_re.match(lines[i])
        if m:
            starts.append((i, m.group(1)))
        elif lines[i] == "  )":
            close = i
            break
    assert close is not None, "map close not found"
    found = {k for _, k in starts}
    missing = keys - found
    assert not missing, f"keys not in queriesBase: {sorted(missing)}"
    # spans: [attached-comment start, next entry start)
    spans = []
    for n, (i, k) in enumerate(starts):
        end = starts[n + 1][0] if n + 1 < len(starts) else close
        # pull in the comment/blank block immediately above the entry
        begin = i
        while begin - 1 > start and (
                lines[begin - 1].strip().startswith("//")
                or lines[begin - 1].strip() == ""):
            begin -= 1
        spans.append((k, begin, i, end))
    # comment blocks belong to the FOLLOWING entry, so a span's effective
    # start is its own comment begin; its effective end is the next span's
    # comment begin (or map close)
    eff = []
    for n, (k, begin, i, end) in enumerate(spans):
        eend = spans[n + 1][1] if n + 1 < len(spans) else close
        eff.append((k, begin, eend))
    moved, keep_mask = [], [True] * len(lines)
    for k, begin, eend in eff:
        if k in keys:
            moved.append((k, "\n".join(lines[begin:eend])))
            for j in range(begin, eend):
                keep_mask[j] = False
    assert len(moved) == len(keys), (len(moved), len(keys))
    entries_txt = ""
    for k, txt in moved:
        t = txt.rstrip()
        if not t.endswith(","):
            t += ","
        entries_txt += t + "\n\n"
    out = f"src/main/scala/graft/{obj}.scala"
    with open(out, "w") as f:
        f.write(HEADER.format(doc=doc, name=obj, entries=entries_txt))
    kept = [l for j, l in enumerate(lines) if keep_mask[j]]
    with open(SRC, "w") as f:
        f.write("\n".join(kept))
    print(f"moved {len(moved)} entries -> {out}; "
          f"SparkEntry now {len(kept)} lines")


if __name__ == "__main__":
    main()
