#!/usr/bin/env python3
"""Diff join/exchange strategy per query between two PLANS dumps.

Usage: python3 tools/plandiff.py PLANS.md PLANS_sf1.md

For each query section, extracts the multiset of join operators
(BroadcastHashJoin / SortMergeJoin / ShuffledHashJoin /
BroadcastNestedLoopJoin / CartesianProduct), AQE markers
(AQEShuffleRead coalesced/skewed), and Exchange count, then prints a
markdown table of queries whose join strategies differ between the two
dumps — the artifact behind the SURVEY §6 sf1 plan-audit table.
"""
import re, sys
from collections import Counter

JOIN_RE = re.compile(
    r"\b(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
    r"BroadcastNestedLoopJoin|CartesianProduct)\b")
AQE_RE = re.compile(r"AQEShuffleRead (\w+)")

def parse(path):
    sections = {}
    name = None
    for line in open(path):
        m = re.match(r"^## (\w+)", line)
        if m:
            name = m.group(1)
            sections[name] = []
        elif name is not None:
            sections[name].append(line)
    out = {}
    for name, lines in sections.items():
        body = "".join(lines)
        joins = Counter(JOIN_RE.findall(body))
        aqe = Counter(AQE_RE.findall(body))
        exch = body.count("Exchange") - body.count("BroadcastExchange")
        out[name] = {"joins": joins, "aqe": aqe, "exchanges": exch,
                     "error": "ERROR:" in body}
    return out

def fmt(c):
    return " ".join(f"{k}x{v}" for k, v in sorted(c.items())) or "-"

def main():
    a, b = parse(sys.argv[1]), parse(sys.argv[2])
    names = sorted(set(a) | set(b))
    print(f"| query | {sys.argv[1]} joins | {sys.argv[2]} joins | AQE markers (b) |")
    print("|---|---|---|---|")
    same = 0
    for n in names:
        ja = a.get(n, {}).get("joins", Counter())
        jb = b.get(n, {}).get("joins", Counter())
        if ja == jb:
            same += 1
            continue
        aqe = fmt(b.get(n, {}).get("aqe", Counter()))
        print(f"| {n} | {fmt(ja)} | {fmt(jb)} | {aqe} |")
    print(f"\n{same}/{len(names)} queries: identical join strategy.")
    errs = [n for n in names if a.get(n, {}).get("error") or b.get(n, {}).get("error")]
    if errs:
        print("ERRORS in sections:", errs)

if __name__ == "__main__":
    main()
