"""Microbenchmark: numpy run-vectorized canonical PRW Sample decode
vs the committed in-place pure-Python walk, at varying samples/series.

Interleaved in-process A/B (alternating old/new per round).  This is
the measurement artifact behind the r12 decision NOT to vectorize the
wire decode with numpy (OPTIMIZATION_r12.md, "Not yet optimized" #1):

    fixture 1000x10x10   ratio 0.93-0.95x  (10-sample runs: probe cost)
    scrape 10000x1x10    ratio 0.94-1.08x  (1-sample series: no runs)
    mid 1000x100x10      ratio 1.43-1.47x
    wide 100x1000x10     ratio 4.41-4.59x  (>=1000-sample runs)

The vectorized path only wins when a series carries long runs of
canonical fixed-size Sample records (>= ~32); every measured surface
(bench fixture 10/series, e2e rows 20-40/series) and the dominant
real remote-write shape (~1 sample/series scrape pushes) sits below
the break-even, where the path costs 0-7%.  Value parity of the
prototype is asserted on every shape before timing."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from oteldb_spark.sources import prw


def build_payload(n_series, n_samples, n_labels):
    series = []
    t0 = 1_700_000_000_000
    for s in range(n_series):
        labels = {"__name__": "metric_%d" % (s % 50)}
        for j in range(n_labels - 1):
            labels["label_%d" % j] = "value_%d_%d" % (s, j)
        samples = [(1.5 * i + s, t0 + 1000 * i) for i in range(n_samples)]
        series.append(prw.encode_time_series(labels, samples))
    return b"".join(prw._enc_len(1, ts) for ts in series)


def decode_ts_numpy(buf):
    """_decode_timeseries with a numpy fast path for runs of
    canonical fixed-size Sample records."""
    labels = {}
    samples = []
    exemplars = []
    histograms = []
    pos = 0
    n = len(buf)
    a = None
    vec_ok = n >= 640
    while pos < n:
        tag = buf[pos]
        if tag == 0x12:
            b = buf[pos + 1]
            if b < 0x80:
                ln, p = b, pos + 2
            else:
                ln, p = prw._uvarint(buf, pos + 1)
            # run-vectorize: canonical fixed-size record 0x12 ln 0x09 d8 0x10 v{k}
            if vec_ok and 11 <= ln < 0x80 and buf[p] == 0x09 and buf[p + 9] == 0x10:
                k = ln - 11
                rec = 2 + ln
                avail = (n - pos) // rec
                if avail < 32:
                    vec_ok = False
                else:
                    if a is None:
                        a = np.frombuffer(buf, np.uint8)
                    idx = np.arange(pos, pos + avail * rec, rec)
                    ok = (a[idx] == 0x12) & (a[idx + 1] == ln) & (a[idx + 2] == 0x09) & (a[idx + 11] == 0x10)
                    # varint shape: k continuation bytes then one final byte < 0x80
                    for j in range(k):
                        ok &= a[idx + 12 + j] >= 0x80
                    ok &= a[idx + 12 + k] < 0x80
                    m = int(ok.argmin()) if not ok.all() else avail
                    if m < 32:
                        vec_ok = False
                    else:
                        block = a[pos:pos + m * rec].reshape(m, rec)
                        vals = block[:, 3:11].copy().view("<f8").ravel()
                        ts = (block[:, 12 + k].astype(np.int64)) << (7 * k)
                        for j in range(k):
                            ts |= (block[:, 12 + j].astype(np.int64) & 0x7F) << (7 * j)
                        samples.extend(zip(vals.tolist(), ts.tolist()))
                        pos += m * rec
                        continue
            pos = p + ln
            samples.append(prw._sample_fast(buf[p:pos]))
        elif tag == 0x0A:
            b = buf[pos + 1]
            if b < 0x80:
                ln, p = b, pos + 2
            else:
                ln, p = prw._uvarint(buf, pos + 1)
            pos = p + ln
            if ln and buf[p] == 0x0A:
                b2 = buf[p + 1]
                if b2 < 0x80:
                    ke, q = p + 2 + b2, p + 2
                else:
                    b2, q = prw._uvarint(buf, p + 1)
                    ke = q + b2
                if ke == pos:
                    labels[buf[q:ke].decode("utf-8")] = ""
                    continue
                if ke < pos and buf[ke] == 0x12:
                    b2 = buf[ke + 1]
                    if b2 < 0x80:
                        ve, vq = ke + 2 + b2, ke + 2
                    else:
                        b2, vq = prw._uvarint(buf, ke + 1)
                        ve = vq + b2
                    if ve == pos:
                        labels[buf[q:ke].decode("utf-8")] = buf[vq:ve].decode("utf-8")
                        continue
            k2, v2 = prw._label_fast(buf[p:pos])
            labels[k2] = v2
        elif tag == 0x1A:
            b = buf[pos + 1]
            if b < 0x80:
                ln, p = b, pos + 2
            else:
                ln, p = prw._uvarint(buf, pos + 1)
            pos = p + ln
            exemplars.append(prw._decode_exemplar(buf[p:pos]))
        elif tag == 0x22:
            b = buf[pos + 1]
            if b < 0x80:
                ln, p = b, pos + 2
            else:
                ln, p = prw._uvarint(buf, pos + 1)
            pos = p + ln
            histograms.append(prw._decode_histogram(buf[p:pos]))
        else:
            pos = prw._skip_generic(buf, pos)
    return {"labels": labels, "samples": samples,
            "exemplars": exemplars, "histograms": histograms}


def decode_request_numpy(data):
    series = []
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos] == 0x0A:
            b = data[pos + 1]
            if b < 0x80:
                ln, p = b, pos + 2
            else:
                ln, p = prw._uvarint(data, pos + 1)
            pos = p + ln
            series.append(decode_ts_numpy(data[p:pos]))
        else:
            pos = prw._skip_generic(data, pos)
    return series


def run(shape_name, n_series, n_samples, n_labels, rounds=7):
    data = build_payload(n_series, n_samples, n_labels)
    old = prw.decode_write_request(data, compressed=False)
    new = decode_request_numpy(data)
    assert repr(old) == repr(new), "MISMATCH %s" % shape_name
    npts = n_series * n_samples
    t_old, t_new = [], []
    for _ in range(rounds):
        t = time.perf_counter(); prw.decode_write_request(data, compressed=False); t_old.append(time.perf_counter() - t)
        t = time.perf_counter(); decode_request_numpy(data); t_new.append(time.perf_counter() - t)
    print("%-28s pts=%7d  old=%.4fs (%.0fk pts/s)  numpy=%.4fs (%.0fk pts/s)  ratio=%.2fx"
          % (shape_name, npts, min(t_old), npts / min(t_old) / 1e3,
             min(t_new), npts / min(t_new) / 1e3, min(t_old) / min(t_new)))


run("fixture 1000x10x10", 1000, 10, 10)
run("wide 100x1000x10", 100, 1000, 10)
run("scrape 10000x1x10", 10000, 1, 10)
run("mid 1000x100x10", 1000, 100, 10)
