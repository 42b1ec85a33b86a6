#!/usr/bin/env python3
"""Split graft.Explain stdout (===== name ===== sections) into per-query
plan files: plans/r13/<name>_<suffix>.txt"""
import sys, re, os
suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
outdir = sys.argv[2] if len(sys.argv) > 2 else "plans/r13"
os.makedirs(outdir, exist_ok=True)
cur, buf = None, []
def flush():
    if cur and buf:
        with open(f"{outdir}/{cur}_{suffix}.txt", "w") as f:
            f.write("".join(buf))
        print(f"wrote {outdir}/{cur}_{suffix}.txt")
for line in sys.stdin:
    m = re.match(r"^===== (\S+) =====$", line.strip())
    if m and m.group(1) != "Subqueries":
        flush(); cur, buf = m.group(1), []
    elif cur is not None:
        buf.append(line)
flush()
