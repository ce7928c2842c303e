#!/usr/bin/env python3
"""Split `graft.Probe <sf> <names> --explain` output into per-query plan
files: `== <name> ==` starts a query's formatted plan, `[probe] <name>:`
ends it. Usage: split_plans.py <probe-output> <outdir> <suffix>
(writes <outdir>/<name>_<suffix>.txt)."""
import sys, os, re

src, outdir, suffix = sys.argv[1], sys.argv[2], sys.argv[3]
os.makedirs(outdir, exist_ok=True)
cur, buf = None, []
for line in open(src, errors="replace"):
    m = re.match(r"== (\S+) ==$", line.strip())
    if m:
        cur, buf = m.group(1), []
        continue
    if cur and line.startswith("[probe] "):
        with open(f"{outdir}/{cur}_{suffix}.txt", "w") as f:
            f.writelines(buf)
        cur, buf = None, []
        continue
    if cur is not None:
        buf.append(line)
print("done", outdir)
