#!/usr/bin/env python3
"""Bench drift tripwire: diff two bench artifacts, list per-query moves.

Round-9 verdict item 5: a per-query regression (ann_hnsw_edges +19%)
shipped silently because nothing diffed the committed BENCH_LATEST
against the prior round. This tool makes unexplained drift impossible to
commit: run it before writing NOTES, and every listed query must be
named there (explained or fixed).

Usage:
    python3 tools/bench_drift.py OLD.json NEW.json [pct] [floor_sec]

Accepts either artifact shape:
  - the repo Bench line          {"metric": ..., "queries": {name: sec}}
  - the driver capture           {"tail": "...", "parsed": {...}|null}
    (queries regex-scraped from the tail when parsed is null, exactly
    like the driver does)

Prints queries whose time moved more than `pct` percent (default 25)
AND whose larger side is at least `floor_sec` (default 0.5 s — sub-half-
second cells are scheduler noise at battery scale), plus added/removed
query names. Exit code 1 if any drift row printed, else 0.
"""
import json
import re
import sys


def anchor_of(path):
    """Host-speed anchor (fixed CPU kernel seconds) if the artifact carries
    one (round-12+); None otherwise. Used to normalize away host-window
    swings (25-40% between sessions, NOTES_r11) before flagging drift."""
    d = json.load(open(path))
    if "anchor_sec" in d:
        return float(d["anchor_sec"])
    if d.get("parsed") and "anchor_sec" in d["parsed"]:
        return float(d["parsed"]["anchor_sec"])
    for line in reversed(d.get("tail", "").splitlines()):
        m = re.search(r'"anchor_sec":([0-9.]+)', line)
        if m:
            return float(m.group(1))
    return None


def queries_of(path):
    d = json.load(open(path))
    if "queries" in d:
        return d["queries"]
    if d.get("parsed") and "queries" in d["parsed"]:
        return d["parsed"]["queries"]
    # driver capture with parsed=null: scrape the last JSON line of tail
    for line in reversed(d.get("tail", "").splitlines()):
        m = re.search(r"\{\"metric\".*\}", line)
        if m:
            return json.loads(m.group(0))["queries"]
    # the driver keeps only the tail's last 2000 chars, which can cut the
    # metric line's head — best-effort partial scrape of "name":sec pairs
    # (query seconds always carry a decimal point; stop at the "metrics"
    # per-query counter section). The committed BENCH_LATEST.json is the
    # authoritative artifact; this fallback only widens what we can diff.
    tail = d.get("tail", "")
    tail = tail.split('"metrics"')[0]
    pairs = re.findall(r'"([a-z][a-z0-9_]+)":([0-9]+\.[0-9]+)', tail)
    out = {k: float(v) for k, v in pairs if k not in ("value", "sf")}
    if out:
        print(f"note: {path} held no complete bench line; "
              f"scraped {len(out)} partial cells from the tail", file=sys.stderr)
        return out
    raise SystemExit(f"{path}: no queries found")


def main():
    old_p, new_p = sys.argv[1], sys.argv[2]
    pct = float(sys.argv[3]) if len(sys.argv) > 3 else 25.0
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5
    old, new = queries_of(old_p), queries_of(new_p)
    # Anchor normalization: when BOTH artifacts carry the fixed CPU-kernel
    # anchor, rescale the new side by old_anchor/new_anchor so a uniformly
    # slower/faster host window doesn't read as per-query drift. Raw values
    # are still printed next to the normalized ones.
    a_old, a_new = anchor_of(old_p), anchor_of(new_p)
    scale = 1.0
    if a_old and a_new and a_old > 0 and a_new > 0:
        scale = a_old / a_new
        print(f"anchors: old {a_old:.3f} s, new {a_new:.3f} s -> "
              f"normalizing new x {scale:.3f}")
    drifted = []
    for name in sorted(set(old) & set(new)):
        a, b = old[name], new[name]
        bn = b * scale
        if max(a, bn) < floor:
            continue
        # a == 0.0 (degenerate old cell) is infinite drift, not a crash
        move = (bn - a) / a * 100.0 if a > 0 else float("inf")
        if abs(move) >= pct:
            drifted.append((move, name, a, b, bn))
    for move, name, a, b, bn in sorted(drifted, reverse=True):
        norm = f" [norm {bn:.2f}]" if scale != 1.0 else ""
        print(f"DRIFT {name}: {a:.2f} -> {b:.2f} s{norm} ({move:+.0f}%)")
    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    def show(names):
        return ", ".join(names[:12]) + (" …" if len(names) > 12 else "")
    if added:
        print(f"added ({len(added)}): {show(added)}")
    if removed:
        print(f"removed ({len(removed)}): {show(removed)}")
    slow = [d for d in drifted if d[0] > 0]
    print(f"{len(slow)} slower / {len(drifted) - len(slow)} faster beyond "
          f"{pct:.0f}% (floor {floor} s) across {len(set(old) & set(new))} "
          f"shared queries")
    sys.exit(1 if drifted else 0)


if __name__ == "__main__":
    main()
