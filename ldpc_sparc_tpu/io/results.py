"""Resumable results store + reference-format converters.

Replaces the reference's filesystem plumbing:
  * the append-only `data/results.txt` campaign log of Python tuples
    (ldpc_jossy/py/ldpc_awgn.py:109-114) — kept as a compatible export
  * `src/results2csv.c` (the tuple-line -> CSV converter) — absorbed as
    `records_to_csv`
  * the .npz sweep snapshots (performance_plots_general.py:138)

The native store is JSONL keyed by (config, snr, seed-block): a crashed
campaign resumes at the first unmeasured cell (SURVEY.md section 5,
checkpoint/resume).
"""

from __future__ import annotations

import csv
import io
import json
import os
from pathlib import Path
from typing import Iterable, List, Optional, Tuple


# Shannon-limit Eb/N0 anchors used by the reference plots
# (ldpc_jossy/py/disp_res.py:47)
SHANNON_EBN0_DB = {0.5: 3.1721, 0.667: 4.0926, 0.75: 4.6693, 0.833: 5.3941}


class ResultsStore:
    """Append-only JSONL store with (key -> record) resume semantics."""

    def __init__(self, path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._seen = {}
        if self.path.exists():
            with open(self.path) as f:
                for line in f:
                    line = line.strip()
                    if not line:
                        continue
                    rec = json.loads(line)
                    self._seen[rec["key"]] = rec

    def has(self, key: str) -> bool:
        return key in self._seen

    def get(self, key: str):
        return self._seen.get(key)

    def append(self, key: str, record: dict):
        rec = {"key": key, **record}
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")
        self._seen[key] = rec

    def records(self) -> List[dict]:
        return list(self._seen.values())


# --------------------------------------------------------------------------
# reference tuple format (results.txt / results.csv)
# --------------------------------------------------------------------------

FIELDS = ("standard", "rate", "z", "snr", "nblocks", "nblockerrors",
          "nbits", "nbiterrors", "niterations")


def record_to_tuple_line(rec: Tuple) -> str:
    """One measurement as the reference's results.txt tuple line
    (ldpc_awgn.py:110-113)."""
    std, rate, z, snr, nblocks, nblk, nbits, nbit, nit = rec
    return repr((std, rate, z, snr, nblocks, nblk, nbits, nbit, nit))


def parse_tuple_line(line: str) -> Optional[Tuple]:
    """Parse a results.txt tuple line (the job of results2csv.c:48-74)."""
    line = line.strip()
    if not (line.startswith("(") and line.endswith(")")):
        return None
    import ast
    try:
        t = ast.literal_eval(line)
    except (ValueError, SyntaxError):
        return None
    return t if len(t) == len(FIELDS) else None


def records_to_csv(records: Iterable[Tuple], path=None) -> str:
    """Measurement tuples -> CSV (replaces src/results2csv.c)."""
    buf = io.StringIO()
    wr = csv.writer(buf)
    wr.writerow(FIELDS)
    for rec in records:
        wr.writerow(rec)
    out = buf.getvalue()
    if path is not None:
        Path(path).write_text(out)
    return out


def results_txt_to_csv(txt_path, csv_path=None) -> str:
    """Convert a reference-format results.txt to CSV."""
    records = []
    with open(txt_path) as f:
        for line in f:
            t = parse_tuple_line(line)
            if t is not None:
                records.append(t)
    return records_to_csv(records, csv_path)


# --------------------------------------------------------------------------
# derived metrics + plotting (disp_res.py:7-131 equivalents)
# --------------------------------------------------------------------------

def waterfall_metrics(rec: Tuple) -> dict:
    """BER / BLER / Eb/N0 for one measurement (disp_res.py derivations)."""
    std, rate, z, snr, nblocks, nblk, nbits, nbit, nit = rec
    num, den = str(rate).split("/")
    R = int(num) / int(den)
    return {
        "standard": std, "rate": rate, "z": z, "snr_db": snr,
        "ber": nbit / nbits if nbits else 0.0,
        "bler": nblk / nblocks if nblocks else 0.0,
        "ebn0_db": snr - 10.0 * __import__("math").log10(R),
        "avg_iters": nit / nblocks if nblocks else 0.0,
    }


def plot_waterfalls(records: Iterable[Tuple], out_path,
                    title: str = "LDPC BER waterfalls"):
    """BER-vs-Eb/N0 plot with Shannon-limit anchors (disp_res.py:40-131).

    A .pdf out_path produces a multi-page document, one page per
    (standard, rate) group (the reference's multi-page PDF export,
    disp_res.py:7-13); any other extension writes a single combined figure.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    groups = {}
    for rec in records:
        m = waterfall_metrics(rec)
        key = (m["standard"], m["rate"], m["z"])
        groups.setdefault(key, []).append(m)

    def draw(ax, keys):
        for (std, rate, z) in keys:
            ms = sorted(groups[(std, rate, z)], key=lambda m: m["ebn0_db"])
            ax.semilogy([m["ebn0_db"] for m in ms],
                        [max(m["ber"], 1e-9) for m in ms],
                        "o-", label=f"{std} {rate} z={z}")
            num, den = str(rate).split("/")
            R = round(int(num) / int(den), 3)
            if R in SHANNON_EBN0_DB:
                ax.axvline(SHANNON_EBN0_DB[R], ls=":", color="gray", lw=1)
        ax.set_xlabel("Eb/N0 (dB)")
        ax.set_ylabel("BER")
        ax.grid(True, which="both", alpha=0.3)
        ax.legend(fontsize=8)

    if str(out_path).endswith(".pdf"):
        from matplotlib.backends.backend_pdf import PdfPages
        pages = {}
        for k in groups:
            pages.setdefault(k[:2], []).append(k)
        with PdfPages(out_path) as pdf:
            for (std, rate), keys in sorted(pages.items()):
                fig, ax = plt.subplots(figsize=(8, 5))
                draw(ax, sorted(keys))
                ax.set_title(f"{title}: {std} rate {rate}")
                fig.tight_layout()
                pdf.savefig(fig)
                plt.close(fig)
        return out_path

    fig, ax = plt.subplots(figsize=(8, 5))
    draw(ax, sorted(groups))
    ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path


def plot_ber_sweep(rows, labels, out_path, title="BER vs SNR"):
    """Multi-decoder BER sweep plot (performance_plots_general.py:141-155).

    rows: list (one per decoder) of lists of dicts with 'snr_db' and 'ber'.
    """
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots(figsize=(10, 4))
    for series, label in zip(rows, labels):
        ax.semilogy([r["snr_db"] for r in series],
                    [max(r["ber"], 1e-9) for r in series], "o-", label=label)
    ax.set_xlabel("SNR")
    ax.set_ylabel("BER")
    ax.set_title(title)
    ax.grid(True, which="both", alpha=0.3)
    ax.legend()
    fig.tight_layout()
    fig.savefig(out_path, dpi=120)
    plt.close(fig)
    return out_path
