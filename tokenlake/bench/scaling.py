"""Two-parallelism scaling evidence (north_rule: ≥0.8 efficiency N → 4N).

No real cluster exists in this sandbox, so the N vs 4N executors criterion is
evidenced by running the identical bench at local[8] and local[32] on the same
input (the sandbox stand-in blessed by BASELINE.md): efficiency =
throughput(32) / (4 × throughput(8)). Results → BENCH/BASELINE.md.

Run: python -m tokenlake.bench.scaling [sf_dir]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys


def run_bench(cpus: int, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus), SPARK_GRAFT_SF_DIR=sf_dir)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    out = subprocess.run(
        [sys.executable, os.path.join(repo, "bench.py")],
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    lo, hi = 8, 32
    r_lo = run_bench(lo, sf_dir)
    r_hi = run_bench(hi, sf_dir)
    enc_eff = r_hi["encode_tokens_per_s"] / (4 * r_lo["encode_tokens_per_s"])
    dec_eff = r_hi["decode_tokens_per_s"] / (4 * r_lo["decode_tokens_per_s"])
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    os.makedirs(os.path.join(repo, "BENCH"), exist_ok=True)
    md = f"""# BENCH/BASELINE.md — two-parallelism scaling evidence

Sandbox stand-in for N vs 4N executors (BASELINE.md): identical input
({sf_dir}), `local[{lo}]` vs `local[{hi}]`, single machine.

| metric | local[{lo}] | local[{hi}] | scaling efficiency (target ≥ 0.8) |
|---|---|---|---|
| encode tokens/s | {r_lo['encode_tokens_per_s']:,} | {r_hi['encode_tokens_per_s']:,} | **{enc_eff:.3f}** |
| encode GB/s (raw token bytes) | {r_lo['encode_GBps']} | {r_hi['encode_GBps']} | — |
| decode tokens/s | {r_lo['decode_tokens_per_s']:,} | {r_hi['decode_tokens_per_s']:,} | **{dec_eff:.3f}** |
| pipeline total (s) | {r_lo['value']} | {r_hi['value']} | — |
| compressed bytes | {r_lo['compressed_bytes']:,} | {r_hi['compressed_bytes']:,} | (identical input ⇒ identical) |
| vs parquet-snappy baseline | {r_lo['bytes_vs_parquet']} | {r_hi['bytes_vs_parquet']} | ≤ 1.0 required |
| bit-identical decode | {r_lo['bit_identical']} | {r_hi['bit_identical']} | must be true |

Raw JSON:

```json
{json.dumps(r_lo)}
{json.dumps(r_hi)}
```
"""
    path = os.path.join(repo, "BENCH", "BASELINE.md")
    with open(path, "w") as f:
        f.write(md)
    print(json.dumps({"encode_efficiency": round(enc_eff, 3), "decode_efficiency": round(dec_eff, 3), "report": path}))


if __name__ == "__main__":
    main()
