#!/usr/bin/env python3
"""SigMF recording catalog + replay (reference ``util/iqrec`` analog).

    python tools/iqrec.py list [dir]
    python tools/iqrec.py replay <basename> [--out out.ts] [extra dvbs2-rx args]
"""

import argparse
import glob
import json
import os
import subprocess
import sys

APPS = os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", "apps")


def cmd_list(args):
    metas = sorted(glob.glob(os.path.join(args.dir, "*.sigmf-meta")))
    if not metas:
        print("no SigMF recordings found")
        return 0
    for m in metas:
        meta = json.load(open(m))
        g = meta.get("global", {})
        ann = (meta.get("annotations") or [{}])[0]
        data = m.replace(".sigmf-meta", ".sigmf-data")
        size = os.path.getsize(data) // 8 if os.path.exists(data) else 0
        print(
            f"{os.path.basename(m)[:-11]:30s} {size:>12d} samples  "
            f"fs={g.get('core:sample_rate', 0):.0f}  "
            f"modcod={ann.get('dvbs2:modcod', '?')} "
            f"frame={ann.get('dvbs2:fecframe_size', '?')} "
            f"pilots={ann.get('dvbs2:pilots', '?')}"
        )
    return 0


def cmd_replay(args, extra):
    meta = json.load(open(args.basename + ".sigmf-meta"))
    ann = (meta.get("annotations") or [{}])[0]
    cmd = [
        sys.executable,
        os.path.join(APPS, "dvbs2-rx"),
        "--in-file", args.basename + ".sigmf-data",
        "--out-file", args.out,
    ]
    if ann.get("dvbs2:modcod"):
        cmd += ["--modcod", str(ann["dvbs2:modcod"])]
    if ann.get("dvbs2:fecframe_size"):
        cmd += ["--frame-size", str(ann["dvbs2:fecframe_size"])]
    if ann.get("dvbs2:pilots"):
        cmd += ["--pilots"]
    if ann.get("dvbs2:rolloff"):
        cmd += ["--rolloff", str(ann["dvbs2:rolloff"])]
    if ann.get("dvbs2:gold_code"):
        cmd += ["--gold-code", str(ann["dvbs2:gold_code"])]
    cmd += extra
    print("+", " ".join(cmd), file=sys.stderr)
    if not args.measure_cpu:
        return subprocess.call(cmd)
    # Host-CPU utilization sampling during replay (reference
    # util/iqrec/cpu.py polls `top`; /proc/<pid>/stat is dependency-free).
    import time

    proc = subprocess.Popen(cmd)
    clk = os.sysconf("SC_CLK_TCK")
    samples = []
    prev = None
    while proc.poll() is None:
        try:
            with open(f"/proc/{proc.pid}/stat") as f:
                parts = f.read().split()
            cpu_s = (int(parts[13]) + int(parts[14])) / clk
        except (OSError, IndexError, ValueError):
            break
        now = time.time()
        if prev is not None and now > prev[1]:
            samples.append(100.0 * (cpu_s - prev[0]) / (now - prev[1]))
        prev = (cpu_s, now)
        time.sleep(0.5)
    if samples:
        print(
            f"cpu%: avg {sum(samples) / len(samples):.1f} "
            f"peak {max(samples):.1f} over {len(samples)} samples",
            file=sys.stderr,
        )
    return proc.wait()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    p_list = sub.add_parser("list")
    p_list.add_argument("dir", nargs="?", default=".")
    p_rep = sub.add_parser("replay")
    p_rep.add_argument("basename")
    p_rep.add_argument("--out", default="-")
    p_rep.add_argument("--measure-cpu", action="store_true",
                       help="sample host-CPU utilization during replay "
                       "(reference util/iqrec cpu measurement)")
    args, extra = ap.parse_known_args()
    if args.cmd == "list":
        return cmd_list(args)
    return cmd_replay(args, extra)


if __name__ == "__main__":
    sys.exit(main())
