"""Results store + reference-format converter tests.

Validates both tuple schemas found in the reference:
  * the historical 10-field lines of ldpc_jossy/data/results.txt (with
    ptype), parsed by src/results2csv.c:49-50
  * the 9-field lines the current ldpc_jossy/py/ldpc_awgn.py:110-113 writes
and the exact numeric CSV schema results2csv.c:62-72 emits (consumed by
py/disp_res.py:23-44).
"""

import math

import pytest

from ldpc_sparc_tpu.io.results import (
    FIELDS, ResultsStore, load_records, normalize_record, parse_csv_line,
    parse_tuple_line, record_to_tuple_line, records_to_csv,
    results_txt_to_csv, waterfall_metrics, plot_waterfalls, SHANNON_EBN0_DB)


# First lines of the reference's archived data/results.txt (10-field schema)
ARCHIVED_LINES = [
    "('802.16', '1/2', 3, 'A', -2.8277568533786299, 100, 100, 3600, 1675, 20000)",
    "('802.16', '3/4', 3, 'A', -0.66347569970478615, 100, 100, 5400, 1325, 20000)",
    "('802.16', '2/3', 3, 'A', -1.3103816364765377, 100, 100, 4800, 1439, 20000)",
]
# The matching first lines of the reference's data/results.csv (the
# results2csv.c output schema: std 16/11, decimal rate, ptype 0/1, ...)
ARCHIVED_CSV = [
    "16, 0.5, 0, 3, -2.82776, 100, 100, 3600, 1675, 20000",
    "16, 0.75, 0, 3, -0.663476, 100, 100, 5400, 1325, 20000",
    "16, 0.666667, 0, 3, -1.31038, 100, 100, 4800, 1439, 20000",
]
# What the current campaign driver writes (ldpc_awgn.py:110, 9 fields)
MODERN_LINE = "('802.11n', '1/2', 27, 3.01, 128, 5, 41472, 57, 3200)"


def test_parse_archived_10_field_lines():
    for line in ARCHIVED_LINES:
        rec = parse_tuple_line(line)
        assert rec is not None and len(rec) == len(FIELDS) == 10
    rec = parse_tuple_line(ARCHIVED_LINES[0])
    assert rec[:4] == ("802.16", "1/2", 3, "A")
    assert rec[5:] == (100, 100, 3600, 1675, 20000)


def test_parse_modern_9_field_line_normalizes():
    rec = parse_tuple_line(MODERN_LINE)
    assert rec == ("802.11n", "1/2", 27, "A", 3.01, 128, 5, 41472, 57, 3200)


def test_parse_rejects_garbage():
    assert parse_tuple_line("not a tuple") is None
    assert parse_tuple_line("(1, 2, 3)") is None
    assert parse_tuple_line("") is None


def test_tuple_line_roundtrip():
    for line in ARCHIVED_LINES + [MODERN_LINE]:
        rec = parse_tuple_line(line)
        assert parse_tuple_line(record_to_tuple_line(rec)) == rec


def test_reference_csv_schema_matches_archived():
    """records_to_csv(style='reference') reproduces results2csv.c's output
    on the reference's own archived measurements (modulo float printing
    precision: %g on a parsed double vs the archived %lg of a %lf scan)."""
    recs = [parse_tuple_line(l) for l in ARCHIVED_LINES]
    got = records_to_csv(recs).strip().splitlines()
    for got_line, want_line in zip(got, ARCHIVED_CSV):
        g, w = got_line.split(", "), want_line.split(", ")
        assert len(g) == len(w) == 10
        # int fields exact
        for i in (0, 2, 3, 5, 6, 7, 8, 9):
            assert g[i] == w[i], (i, got_line, want_line)
        # float fields to printed precision
        assert math.isclose(float(g[1]), float(w[1]), abs_tol=1e-5)
        assert math.isclose(float(g[4]), float(w[4]), abs_tol=1e-4)


def test_named_csv_has_header():
    recs = [parse_tuple_line(MODERN_LINE)]
    out = records_to_csv(recs, style="named").splitlines()
    assert out[0].split(",") == list(FIELDS)
    assert len(out) == 2


def test_results_txt_to_csv_end_to_end(tmp_path):
    txt = tmp_path / "results.txt"
    txt.write_text("\n".join(ARCHIVED_LINES + [MODERN_LINE]) + "\n")
    csv_path = tmp_path / "results.csv"
    out = results_txt_to_csv(txt, csv_path)
    assert csv_path.read_text() == out
    assert len(out.strip().splitlines()) == 4


def test_waterfall_metrics_values():
    m = waterfall_metrics(parse_tuple_line(ARCHIVED_LINES[0]))
    assert m["ber"] == pytest.approx(1675 / 3600)
    assert m["bler"] == pytest.approx(1.0)
    assert m["avg_iters"] == pytest.approx(200.0)
    # EbN0 = EsN0 - 10 log10(R)  (disp_res.py:44)
    assert m["ebn0_db"] == pytest.approx(
        -2.8277568533786299 - 10 * math.log10(0.5))
    assert m["ptype"] == "A"


def test_shannon_anchors():
    assert SHANNON_EBN0_DB == {0.5: 3.1721, 0.667: 4.0926,
                               0.75: 4.6693, 0.833: 5.3941}


def test_normalize_record_rejects_wrong_arity():
    with pytest.raises(ValueError):
        normalize_record(("802.16", "1/2", 3))


def test_results_store_resume(tmp_path):
    path = tmp_path / "store.jsonl"
    s1 = ResultsStore(path)
    assert not s1.has("a")
    s1.append("a", {"ber": 0.1})
    s1.append("b", {"ber": 0.2})
    # crash + resume: a fresh store sees both cells
    s2 = ResultsStore(path)
    assert s2.has("a") and s2.has("b")
    assert s2.get("b")["ber"] == 0.2
    # re-append overwrites the in-memory view (latest wins)
    s2.append("a", {"ber": 0.05})
    s3 = ResultsStore(path)
    assert s3.get("a")["ber"] == 0.05
    assert len(s3.records()) == 2


def test_parse_csv_line_roundtrip():
    """Numeric CSV rows (the disp_res.py input format) parse back to the
    tuple records they came from, up to float printing precision."""
    for txt_line, csv_line in zip(ARCHIVED_LINES, ARCHIVED_CSV):
        want = parse_tuple_line(txt_line)
        got = parse_csv_line(csv_line)
        assert got[:4] == want[:4]
        assert got[4] == pytest.approx(want[4], abs=1e-4)
        assert got[5:] == want[5:]
    assert parse_csv_line("1, 2, 3") is None
    assert parse_csv_line("a, b, c, d, e, f, g, h, i, j") is None


def test_load_records_all_formats(tmp_path):
    """load_records auto-detects tuple .txt, numeric .csv, and named .csv."""
    recs = [parse_tuple_line(l) for l in ARCHIVED_LINES + [MODERN_LINE]]
    txt = tmp_path / "r.txt"
    txt.write_text("\n".join(ARCHIVED_LINES + [MODERN_LINE]) + "\n")
    ncsv = tmp_path / "r_num.csv"
    records_to_csv(recs, ncsv, style="reference")
    acsv = tmp_path / "r_named.csv"
    records_to_csv(recs, acsv, style="named")
    assert load_records(txt) == recs
    assert load_records(acsv) == recs
    num = load_records(ncsv)
    assert [r[:4] + r[5:] for r in num] == [r[:4] + r[5:] for r in recs]
    for a, b in zip(num, recs):
        assert a[4] == pytest.approx(b[4], abs=1e-4)


def test_native_results2csv_matches_python(tmp_path):
    """The C++ converter (native/results2csv.cpp, the counterpart of the
    reference's src/results2csv.c) is byte-identical to the Python one on
    both tuple schemas."""
    from ldpc_sparc_tpu.native.tools import results2csv_native
    txt = tmp_path / "results.txt"
    txt.write_text("\n".join(ARCHIVED_LINES + [MODERN_LINE]) + "\n")
    native = results2csv_native(txt)
    py = results_txt_to_csv(txt)
    assert native == py
    assert len(native.splitlines()) == 4
    # file-output mode writes the same bytes
    out = tmp_path / "results.csv"
    assert results2csv_native(txt, out) == native
    assert out.read_text() == native


def test_plot_waterfalls_both_formats(tmp_path):
    recs = [parse_tuple_line(l) for l in ARCHIVED_LINES + [MODERN_LINE]]
    png = plot_waterfalls(recs, tmp_path / "w.png")
    assert (tmp_path / "w.png").exists()
    pdf = plot_waterfalls(recs, tmp_path / "w.pdf")
    assert (tmp_path / "w.pdf").exists()


def test_config_key_distinguishes_configs():
    """Resume keys carry the full sweep config: a changed config in the
    same --out dir must NOT resume from stale rows (round-1 weak #6)."""
    from ldpc_sparc_tpu.cli import _config_key
    from ldpc_sparc_tpu.config import SparcParams
    base = dict(params=SparcParams(P=15.0, R=1.3, L=64, M=16),
                t_max=10, trials=4)
    k1 = _config_key(**base)
    k1b = _config_key(**base)
    k2 = _config_key(**{**base, "params": SparcParams(P=15.0, R=1.3,
                                                      L=64, M=32)})
    k3 = _config_key(**{**base, "t_max": 25})
    assert k1 == k1b
    assert len({k1, k2, k3}) == 3


def test_plot_standard_comparison(tmp_path):
    """The reference's SECOND disp_res figure family (per-z pages, 2x2
    rate panels, standards as overlaid series with the Shannon anchor,
    disp_res.py:96-123) renders from record tuples — multi-page PDF and
    single-figure PNG."""
    from ldpc_sparc_tpu.io.results import plot_standard_comparison
    recs = []
    for std, z, pt in (("802.11n", 27, "A"), ("802.16", 27, "A"),
                       ("802.16", 27, "B"), ("802.16", 54, "A")):
        for i, snr in enumerate((1.0, 2.0, 3.0)):
            recs.append((std, "2/3", z, pt, snr, 1000, 100 - 30 * i,
                         64800, 5000 // (i + 1), 50000))
    pdf = tmp_path / "cmp.pdf"
    png = tmp_path / "cmp.png"
    plot_standard_comparison(recs, str(pdf))
    plot_standard_comparison(recs, str(png), metric="bler")
    assert pdf.stat().st_size > 1000
    assert png.stat().st_size > 1000
