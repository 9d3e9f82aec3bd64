"""Independent formula audit of the statistics tiers (VERDICT r10
item 3): recompute each statistic with PURE NUMPY/PANDAS from the raw
parquet — outside both SQL engines — and compare against the DuckDB
oracle value.

Why this exists: the driver's correctness gate proves Spark ≡ DuckDB,
but both sides replay the SAME hand-derived formula, so a formula-level
bug (the r9 AD²-normalization class) is invisible to parity.  This
harness re-derives each statistic from its textbook definition with a
completely different toolchain (pandas frame ops + numpy array math, no
SQL) and prices the engine value against it.

Conventions:
  * The shared input frames (daily revenue, $10-bucket two-segment
    histogram, monthly series…) are rebuilt in pandas replicating the
    catalog's cents-trick integerization — the FRAME construction is
    driver-parity-tested already; the STATISTIC formula downstream of
    the frame is what this audit targets.
  * Engine values are integer micro-units (floor(x*1e6) etc.).  The
    numpy replay computes the real-valued statistic and the comparison
    allows `tol` integer units (default 2) for floor-at-boundary and
    double-associativity drift; counts and order statistics compare
    exact.  Anything larger prints MISMATCH and exits non-zero.
  * scipy is not in the environment; closed-form special functions the
    statistics need (normal CDF, chi2 tail gates) are implemented here
    from standard published series — same public-knowledge basis as the
    catalog itself.

Usage:  python tools/stat_audit.py [sf_dir] [query ...]
Default sf_dir /root/testdata/sf0.001 (brute-force friendly);
no query args = run every registered audit.
"""

from __future__ import annotations

import math
import os
import sys

import numpy as np
import pandas as pd

REPO = os.environ.get("SPARK_GRAFT_REPO", "/root/repo")
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()

AUDITS: dict[str, "callable"] = {}


def audit(name: str):
    def deco(fn):
        AUDITS[name] = fn
        return fn

    return deco


# ---------------------------------------------------------------------------
# raw-table + shared-frame loaders (pandas, no SQL)
# ---------------------------------------------------------------------------


class Data:
    """Lazy raw-parquet loader + memoized shared frames."""

    def __init__(self, sf_dir: str):
        self.sf_dir = sf_dir
        self._t: dict[str, pd.DataFrame] = {}

    def table(self, name: str) -> pd.DataFrame:
        if name not in self._t:
            self._t[name] = pd.read_parquet(
                os.path.join(self.sf_dir, f"{name}.parquet")
            )
        return self._t[name]

    # --- shared frames (replicating catalog integerization) -----------

    def day(self) -> pd.DataFrame:
        """catalog_r8d._day_sql: daily revenue, cents-summed then
        //100000 → units of $1000 (integer)."""
        o = self.table("orders")
        cents = np.round(o["o_totalprice"].to_numpy() * 100).astype(np.int64)
        d = pd.DataFrame(
            {
                "t": (o["o_orderdate"] - o["o_orderdate"].min()).dt.days,
                "c": cents,
            }
        )
        g = d.groupby("t", as_index=False)["c"].sum()
        g["y"] = g["c"] // 100000
        return g[["t", "y"]].sort_values("t").reset_index(drop=True)

    def two_group_hist(self) -> pd.DataFrame:
        """catalog_r9a._two_group_hist_sql: $10-bucket histograms for
        the two market segments (BUILDING vs MACHINERY — read the
        constants from the module so drift can't silently fork)."""
        from beacon_data_importer_spark import catalog_r9a as R9A

        a, b = R9A._BM_SEG_A, R9A._BM_SEG_B
        o = self.table("orders")
        c = self.table("customer")
        m = o.merge(
            c[["c_custkey", "c_mktsegment"]],
            left_on="o_custkey",
            right_on="c_custkey",
        )
        m = m[m["c_mktsegment"].isin([a, b])]
        v = (
            np.round(m["o_totalprice"].to_numpy() * 100).astype(np.int64)
            // 1000
        )
        h = pd.DataFrame({"v": v, "seg": m["c_mktsegment"].to_numpy()})
        g = (
            h.groupby("v")["seg"]
            .agg(
                c1=lambda s: int((s == a).sum()),
                c2=lambda s: int((s == b).sum()),
            )
            .reset_index()
            .sort_values("v")
            .reset_index(drop=True)
        )
        return g

    def expand_two_groups(self) -> tuple[np.ndarray, np.ndarray]:
        """The two segment samples as raw bucket-value arrays."""
        g = self.two_group_hist()
        x = np.repeat(g["v"].to_numpy(), g["c1"].to_numpy())
        y = np.repeat(g["v"].to_numpy(), g["c2"].to_numpy())
        return x, y


# ---------------------------------------------------------------------------
# special functions (public textbook series; no scipy in env)
# ---------------------------------------------------------------------------


def norm_cdf(z: float) -> float:
    return 0.5 * math.erfc(-z / math.sqrt(2.0))


# ---------------------------------------------------------------------------
# oracle runner
# ---------------------------------------------------------------------------


def oracle_row(sf_dir: str, name: str) -> dict:
    """Run the catalog's DuckDB oracle for `name`, return the (single)
    row as a dict — multi-row oracles return list[dict]."""
    import duckdb

    import __spark_entry__ as entry

    sql = entry.oracle_sql()[name]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    df = con.execute(sql).df()
    recs = df.to_dict("records")
    return recs[0] if len(recs) == 1 else recs


# ---------------------------------------------------------------------------
# comparison
# ---------------------------------------------------------------------------


def check(
    name: str,
    got: dict,
    want: dict,
    tol: dict | int = 2,
) -> list[str]:
    """Compare engine row `got` vs numpy row `want`.

    `want` values may be (value, tol) tuples for per-column tolerance;
    plain ints/floats use the default `tol` integer units.
    """
    errs = []
    for k, w in want.items():
        if k not in got:
            errs.append(f"{k}: missing from oracle row")
            continue
        g = got[k]
        t = tol
        if isinstance(w, tuple):
            w, t = w
        if g is None or (isinstance(g, float) and math.isnan(g)):
            errs.append(f"{k}: oracle NULL, numpy {w}")
            continue
        if isinstance(t, tuple) and t[0] == "rel":
            denom = max(abs(float(w)), 1e-12)
            if abs(float(g) - float(w)) / denom > t[1]:
                errs.append(f"{k}: oracle {g} vs numpy {w} (rel tol {t[1]})")
        elif abs(float(g) - float(w)) > t:
            errs.append(f"{k}: oracle {g} vs numpy {w} (tol {t})")
    return errs


def run(sf_dir: str, names: list[str]) -> int:
    data = Data(sf_dir)
    failures = []
    for n in names:
        if n not in AUDITS:
            print(f"SKIP {n}: no audit registered")
            continue
        try:
            errs = AUDITS[n](data, oracle_row(sf_dir, n))
        except Exception as e:  # pragma: no cover - audit harness
            errs = [f"audit raised {type(e).__name__}: {e}"]
        if errs:
            failures.append(n)
            print(f"MISMATCH {n}:")
            for e in errs:
                print(f"  {e}")
        else:
            print(f"OK {n}")
    print(
        f"\n{len(names) - len(failures)}/{len(names)} audits match"
        + (f"; FAILURES: {failures}" if failures else "")
    )
    return 1 if failures else 0


def main() -> None:
    args = sys.argv[1:]
    sf_dir = "/root/testdata/sf0.001"
    if args and os.path.isdir(args[0]):
        sf_dir = args.pop(0)
    names = args or sorted(AUDITS)
    sys.exit(run(sf_dir, names))


# ===========================================================================
# audits — tier r10a: robust location/scale
# ===========================================================================


@audit("qn_scale_estimator")
def a_qn(data: Data, row) -> list[str]:
    y = data.day()["y"].to_numpy().astype(np.int64)
    n = len(y)
    d = np.abs(y[:, None] - y[None, :])[np.triu_indices(n, 1)]
    d.sort()
    h = n // 2 + 1
    k = h * (h - 1) // 2
    qn_raw = int(d[k - 1])
    qn_scaled = (2_219_140 * qn_raw) // 1_000_000
    return check(
        "qn",
        row,
        {
            "n_days": (n, 0),
            "k_order": (k, 0),
            "qn_raw": (qn_raw, 0),
            "qn_scaled": (qn_scaled, 0),
        },
    )


@audit("sn_scale_estimator")
def a_sn(data: Data, row) -> list[str]:
    y = data.day()["y"].to_numpy().astype(np.float64)
    n = len(y)
    # Sn = c * lowmed_i (himed_{j != i} |y_i - y_j|)
    inner = []
    for i in range(n):
        d = np.abs(y[i] - np.delete(y, i))
        d.sort()
        # himed: order statistic at ceil((n-1+1)/2)= (n)//2 th of n-1
        # values (1-indexed high median = floor((n-1)/2)+1)
        inner.append(d[(n - 1) // 2])
    inner = np.sort(np.array(inner))
    lowmed = inner[(n + 1) // 2 - 1]
    sn_scaled = (1_192_600 * int(lowmed)) // 1_000_000
    return check(
        "sn",
        row,
        {"n_days": (n, 0), "sn_raw": (int(lowmed), 0), "sn_scaled": (sn_scaled, 0)},
    )




def _lowmed(a: np.ndarray):
    """k = (n+1)//2-th order statistic (the catalogs' median rank)."""
    a = np.sort(np.asarray(a))
    return a[(len(a) + 1) // 2 - 1]


@audit("biweight_midvariance")
def a_bwmv(data: Data, row) -> list[str]:
    y = data.day()["y"].to_numpy().astype(np.float64)
    n = len(y)
    m = _lowmed(y)
    a = y - m
    mad = _lowmed(np.abs(a))
    u2 = (a * a) / (81.0 * mad * mad)
    keep = u2 < 1.0
    w = 1.0 - u2[keep]
    num = float(np.sum(a[keep] ** 2 * w**4))
    den = float(np.sum(w * (1.0 - 5.0 * u2[keep])))
    bwmv = n * num / (den * den)
    svar = float(np.var(y, ddof=1))
    return check(
        "bwmv",
        row,
        {
            "n_days": (n, 0),
            "bwmv": (bwmv, ("rel", 1e-3)),
            # engine emits the floored integer variance: ±1 unit
            "sample_var": (svar, 1),
        },
    )


@audit("trimean_bowley_skew")
def a_trimean(data: Data, row) -> list[str]:
    y = np.sort(data.day()["y"].to_numpy().astype(np.int64))
    n = len(y)
    mpos = (n + 1) // 2
    hpos = (mpos + 1) // 2
    q1, q2, q3 = int(y[hpos - 1]), int(y[mpos - 1]), int(y[n - hpos])
    trimean_e2 = ((q1 + 2 * q2 + q3) * 100) // 4
    bowley = (q3 + q1 - 2 * q2) * 1e6 / (q3 - q1)
    return check(
        "trimean",
        row,
        {
            "n_days": (n, 0),
            "q1": (q1, 0),
            "q2": (q2, 0),
            "q3": (q3, 0),
            "trimean_e2": (trimean_e2, 0),
            "bowley_skew_e6": (bowley, 2),
        },
    )


@audit("medcouple_skew_lite")
def a_medcouple(data: Data, row) -> list[str]:
    y = data.day()["y"].to_numpy().astype(np.float64)
    m = float(_lowmed(y))
    lo = y[y < m]
    hi = y[y > m]
    a, b = np.meshgrid(lo, hi)
    h = ((b - m) - (m - a)) / (b - a)
    kn = h.size
    mc = _lowmed(h.ravel())
    return check(
        "medcouple",
        row,
        {
            "n_kernel_pairs": (kn, 0),
            "medcouple_e6": (mc * 1e6, 2),
            "right_skewed": (1 if mc > 0 else 0, 0),
        },
    )


@audit("hampel_outlier_flags")
def a_hampel(data: Data, row_list) -> list[str]:
    day = data.day()
    t = day["t"].to_numpy()
    y = day["y"].to_numpy().astype(np.int64)
    errs = []
    got = {int(r["day_t"]): r for r in row_list}
    n_flag_engine = sum(bool(r["is_outlier"]) for r in row_list)
    n_flag_np = 0
    if len(row_list) != len(day):
        errs.append(f"row count {len(row_list)} vs {len(day)} days")
    for i in range(len(day)):
        w = y[(t >= t[i] - 7) & (t <= t[i] + 7)]
        med = int(_lowmed(w))
        mad = int(_lowmed(np.abs(w - med)))
        flag = abs(int(y[i]) - med) * 10000 > 44478 * mad
        n_flag_np += flag
        g = got.get(int(t[i]))
        if g is None:
            errs.append(f"day {t[i]} missing from engine output")
            continue
        if int(g["med_y"]) != med or int(g["mad_y"]) != mad or bool(
            g["is_outlier"]
        ) != flag:
            errs.append(
                f"day {t[i]}: engine (med {g['med_y']}, mad {g['mad_y']}, "
                f"flag {g['is_outlier']}) vs numpy ({med}, {mad}, {flag})"
            )
    if not errs and n_flag_engine != n_flag_np:
        errs.append(f"flag count {n_flag_engine} vs {n_flag_np}")
    return errs


@audit("repeated_median_slope")
def a_siegel(data: Data, row) -> list[str]:
    day = data.day()
    t = day["t"].to_numpy().astype(np.float64)
    y = day["y"].to_numpy().astype(np.float64)
    n = len(y)
    meds = []
    for i in range(n):
        dt = t - t[i]
        mask = dt != 0
        meds.append(_lowmed((y[mask] - y[i]) / dt[mask]))
    slope = float(_lowmed(np.array(meds)))
    # intercept from the FLOORED e6 slope (the engine residual uses
    # the integerized slope; replay that one integer step)
    slope_e6 = int(row["slope_e6"])
    intercept = float(_lowmed(y * 1e6 - slope_e6 * t)) / 1e6
    return check(
        "siegel",
        row,
        {
            "n_days": (n, 0),
            "slope_e6": (slope * 1e6, 2),
            "intercept": (intercept, 1.5),
        },
    )


@audit("yuen_trimmed_t")
def a_yuen(data: Data, row) -> list[str]:
    x, y = data.expand_two_groups()

    def side(v: np.ndarray):
        v = np.sort(v.astype(np.float64))
        n = len(v)
        g = n // 5
        h = n - 2 * g
        kept = v[g : n - g]
        ts = kept.sum()
        lo, hi = v[g], v[n - g - 1]
        ws = ts + g * (lo + hi)
        wss = (kept**2).sum() + g * (lo * lo + hi * hi)
        d = (wss - ws * ws / n) / (h * (h - 1))
        return n, g, h, ts, d

    n1, g1, h1, ts1, d1 = side(x)
    n2, g2, h2, ts2, d2 = side(y)
    tstat = (ts1 / h1 - ts2 / h2) / math.sqrt(d1 + d2)
    return check(
        "yuen",
        row,
        {
            "n1": (n1, 0),
            "n2": (n2, 0),
            "h1": (h1, 0),
            "h2": (h2, 0),
            "trim_mean1_e6": (ts1 / h1 * 1e6, 2),
            "trim_mean2_e6": (ts2 / h2 * 1e6, 2),
            "t_e6": (tstat * 1e6, 2),
            "reject_equal_trimmed_means": (
                1 if abs(tstat) * 1e6 > 1_959_963 else 0,
                0,
            ),
        },
    )


if __name__ == "__main__":
    main()
