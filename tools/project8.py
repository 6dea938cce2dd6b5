"""v5e-8 projection for the 512^3 headline pipeline (`bench.py --project8`).

The repo runs on ONE v5e chip; BASELINE.json's north star (< 1 s) assumes a
v5e-8.  This tool replaces the bare "8x via INV3_SHARDED" assertion with a
measured model:

  projected stage time = (measured single-chip stage time
                          x per-shard work fraction      [measured counts]
                          x schedule ratio               [measured rounds])
                         + comm bytes / ICI bandwidth    [closed form]

Three measurement artifacts feed it (each written by a mode of this file):

- ``.bench_stages.json``   — warm single-chip stage times at 512^3
                             (bench_profile.py on the real TPU).
- ``.project8_counts.json``— sharded-schedule counts on the virtual 8-CPU
                             mesh (``--collect N``): watershed rounds per
                             multigrid level (sharded AND single-device —
                             round counts are a pure function of the input,
                             identical on CPU/TPU for the same data), and
                             per-shard surface bucket sizes (checks).
- ``.project8_tpu.json``   — per-round watershed sweep cost at each
                             multigrid level shape, measured warm on the
                             real chip (``--tpu-probe``; optional — falls
                             back to deriving per-round cost from the
                             single-chip stage time and round counts).

Comm model (all exchanges are nearest-neighbor over one ICI axis):

- watershed: 3 ``_halo_z`` per round (rank, lab, f) = 6 planes of
  (Y_l x X_l) int32 per shard per round, at each level's Y/X.
- surface extraction: 2 mask halos (u8 planes) + one BOUND-bucket id
  ppermute; fused ca-smoothing: (6 x BOUND) f32 staircase minmax once,
  chamfer ghost refresh 3 planes x steps, Taubin ring exchange
  (4 + 3) x BOUND f32 per pass x 2 passes x n_iters.
- ICI: v5e one-direction per-link bandwidth assumed 4.5e10 B/s (public
  v5e spec: 1600 Gbps aggregate ICI per chip over 4 links).  Comm totals
  here are tens of MB, so even a 10x error moves the projection < 0.1 s.

Reference for the target: BASELINE.json north star;
reference pipeline: /root/reference/invesalius/data/surface_process.py:172-319.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ICI_BPS = 4.5e10          # one-direction per-link, v5e (assumption, stated)
PCIE_D2H_BPS = 8e9        # real-host d2h (not the dev relay tunnel)
N = 8                     # target chip count
HOST_CORES = 8            # v5e-8 host cores used by stl_pack_mt


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# ---------------------------------------------------------------------------
# --collect: sharded + single-device schedule counts on the virtual CPU mesh
# ---------------------------------------------------------------------------

def collect(size: int, skip_single: bool = False,
            label_only: bool = False, surface_only: bool = False) -> dict:
    import numpy as np
    import jax
    from jax.sharding import Mesh

    sys.path.insert(0, REPO)
    from bench import make_ct
    from invesalius3_tpu.ops import watershed as ws
    from invesalius3_tpu.parallel import sharded_ops

    n = size
    ct = make_ct(n)
    markers = np.zeros(ct.shape, np.int16)
    c = n // 2
    markers[c, c, int(0.61 * n)] = 1
    markers[c, c, c] = 2
    markers[2, 2, 2] = 3

    out = {"size": n, "n_shards": N}

    zmesh = Mesh(np.asarray(jax.devices()[:N]), ("z",))
    if surface_only:
        # bucket-sizing / smoothing edits don't change the watershed:
        # reuse the existing counts' rounds and labels (recomputed from
        # the single-chip path, identical schedule-independent output),
        # redo only the surface stats
        prev = _load(".project8_counts.json")
        if prev is None or prev["size"] != n:
            raise SystemExit("--surface-only needs a committed counts "
                             "file at the same size")
        for k in ("sharded_rounds_label", "sharded_rounds",
                  "label_vs_rank_agreement", "single_rounds",
                  "surface_uniform"):
            if k in prev:
                out[k] = prev[k]
        import jax.numpy as jnp

        lab_dev = ws.watershed(jnp.asarray(ct), jnp.asarray(markers),
                               algorithm="Watershed")
        labels = np.asarray(lab_dev)
        label_only = skip_single = True
    else:
        run_l = sharded_ops.sharded_watershed(zmesh, stop="label",
                                              quiet_rounds=2)
        labels_l, rounds_l = run_l(ct, markers, algorithm="Watershed",
                                   debug_rounds=True)
        out["sharded_rounds_label"] = np.asarray(rounds_l)[0].tolist()
        log(f"[{n}] label-stop rounds: {out['sharded_rounds_label']}")
        labels = labels_l
    if not label_only:
        # rank-stop run is ~12x more fine-level rounds — prohibitive on
        # the 1-core CPU mesh at 512^3, so it is opt-out there
        run = sharded_ops.sharded_watershed(zmesh)
        labels, rounds = run(ct, markers, algorithm="Watershed",
                             debug_rounds=True)
        rounds = np.asarray(rounds)[0].tolist()  # coarse -> fine
        out["sharded_rounds"] = rounds
        log(f"[{n}] rank-stop rounds per level (coarse->fine): {rounds}")
        out["label_vs_rank_agreement"] = float(
            (np.asarray(labels_l) == np.asarray(labels)).mean())
        log(f"[{n}] label vs rank agreement: "
            f"{out['label_vs_rank_agreement']:.6f}")

    mask = np.where(np.asarray(labels) == 1, 255, 0).astype(np.uint8)
    verts, faces, stats = sharded_ops.sharded_mask_to_surface(
        zmesh, mask, spacing=(0.5, 0.5, 0.5),
        smooth={"t": 0.7, "tmax": 3.0, "bmin": 0.5, "n_iters": 10},
        return_stats=True, balance=True)
    out["surface"] = stats
    if "--no-uniform" not in sys.argv:
        # uniform-partition comparison (balance=False) for the same mask:
        # quantifies how much the triangle-equalizing cuts shrink the max
        # shard (the taubin gather floor scales with it)
        _, _, stats_u = sharded_ops.sharded_mask_to_surface(
            zmesh, mask, spacing=(0.5, 0.5, 0.5),
            smooth={"t": 0.7, "tmax": 3.0, "bmin": 0.5, "n_iters": 10},
            return_stats=True, balance=False)
        out["surface_uniform"] = stats_u
        bal_max = max(c[1] for c in stats["checks"])
        uni_max = max(c[1] for c in stats_u["checks"])
        log(f"[{n}] max-shard tris: uniform {uni_max} -> balanced {bal_max} "
            f"(cuts {stats['cuts']})")
    out["n_verts"], out["n_tris"] = len(verts), len(faces)
    log(f"[{n}] surface: V={len(verts)} T={len(faces)} "
        f"buckets=({stats['max_active']},{stats['max_tris']}) "
        f"per-shard checks={stats['checks']}")

    if not skip_single:
        import jax.numpy as jnp

        ws.watershed(jnp.asarray(ct), jnp.asarray(markers),
                     algorithm="Watershed")
        out["single_rounds"] = [
            {"shape": list(s), "rounds": r} for s, r in ws.LAST_REFINE_ROUNDS]
        log(f"[{n}] single-device rounds: {out['single_rounds']}")
    return out


# ---------------------------------------------------------------------------
# --tpu-probe: warm per-round sweep cost at each multigrid level shape
# ---------------------------------------------------------------------------

def tpu_probe() -> dict:
    import time

    import numpy as np
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, REPO)
    from bench import make_ct
    from invesalius3_tpu.ops import watershed as ws

    n = int(os.environ.get("BENCH_SIZE", "512"))
    ct = make_ct(n)
    markers = np.zeros(ct.shape, np.int16)
    c = n // 2
    markers[c, c, int(0.61 * n)] = 1
    markers[c, c, c] = 2
    markers[2, 2, 2] = 3

    # full watershed once: records the single-device schedule on this chip
    t0 = time.perf_counter()
    lab = ws.watershed(jnp.asarray(ct), jnp.asarray(markers),
                       algorithm="Watershed")
    _ = float(jnp.sum(lab.astype(jnp.float32)))
    t_total_cold = time.perf_counter() - t0
    single_rounds = [
        {"shape": list(s), "rounds": r} for s, r in ws.LAST_REFINE_ROUNDS]
    log(f"single-device rounds (cold {t_total_cold:.1f}s): {single_rounds}")

    # warm per-round cost per level shape: time k rounds of _refine_round
    per_round = {}
    f = jnp.clip(jnp.asarray(ct).astype(jnp.int32), 0, 2**16 - 2)
    lab0 = jnp.asarray(markers).astype(jnp.int32)
    for lvl in range(3):
        shape = tuple(s // (2 ** lvl) for s in ct.shape)
        f_l = f[:shape[0], :shape[1], :shape[2]]
        l_l = lab0[:shape[0], :shape[1], :shape[2]]
        frozen = l_l != 0
        # _refine_round donates rank/lab: every call needs FRESH buffers,
        # and the returned arrays are the only valid handles afterwards
        mk = lambda: (jnp.where(frozen, jnp.int32(0), ws._INF_RANK) + 0,
                      l_l + 0)
        rank, lab_l = mk()
        r1, l1, _ = ws._refine_round(rank, lab_l, f_l, l_l, frozen, 6, 2)
        _ = float(jnp.sum(r1.astype(jnp.float32)))  # warm the compile
        rank, lab_l = mk()
        k = 4  # rounds (2 calls x inner_rounds=2)
        t0 = time.perf_counter()
        for _ in range(2):
            rank, lab_l, _ = ws._refine_round(rank, lab_l, f_l, l_l, frozen,
                                              6, 2)
        _ = float(jnp.sum(rank.astype(jnp.float32)))
        dt = time.perf_counter() - t0
        per_round[str(shape[0])] = round(dt / k, 4)
        log(f"level shape {shape}: {dt / k * 1e3:.1f} ms/round")

    return {"size": n, "single_rounds": single_rounds,
            "per_round_s": per_round}


# ---------------------------------------------------------------------------
# projection
# ---------------------------------------------------------------------------

def _load(name):
    p = os.path.join(REPO, name)
    if not os.path.exists(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def project(emit_json: bool = True) -> dict:
    stages_doc = _load(".bench_stages.json")
    counts = _load(".project8_counts.json")
    tpu = _load(".project8_tpu.json")
    if stages_doc is None or counts is None:
        raise SystemExit(
            "missing measurement artifacts: run `python bench_profile.py` on "
            "the TPU and `python tools/project8.py --collect 512` on the CPU "
            "mesh first")
    st = stages_doc["stages"]
    n = stages_doc["size"]
    Yp = Xp = n + 2

    # ---- watershed ------------------------------------------------------
    # label-stop rounds when measured (the scaling path's default since
    # they reproduce rank-stop labels bitwise at 1/10th the fine rounds)
    sh_rounds = (counts.get("sharded_rounds_label")
                 or counts["sharded_rounds"])  # coarse -> fine
    n_levels = len(sh_rounds) - 1
    # per-round cost per level: measured directly if the TPU probe ran,
    # else derived from the single-chip stage time + single-device rounds
    # (cost per round scales with level voxels)
    lvl_shapes = [n // (2 ** (n_levels - i)) for i in range(n_levels + 1)]
    if tpu and "per_round_s" in tpu:
        per_round = {int(k): v for k, v in tpu["per_round_s"].items()}
        t_round = [per_round.get(s) for s in lvl_shapes]
        # fill gaps by voxel scaling from the nearest measured level
        known = [(s, v) for s, v in per_round.items() if v]
        ref_s, ref_v = known[0]
        t_round = [v if v else ref_v * (s / ref_s) ** 3
                   for s, v in zip(lvl_shapes, t_round)]
    else:
        # the per-round cost divides the measured single-chip stage time by
        # its OWN schedule — the rounds must come from the same size the
        # stage time was measured at (the TPU probe), not the CPU collect
        single = [e for e in (tpu or {}).get("single_rounds", [])
                  if max(e["shape"]) == n] and (tpu or {})["single_rounds"]
        single = single or counts.get("single_rounds")
        if not single:
            raise SystemExit("need single_rounds (collect without "
                             "--skip-single) or .project8_tpu.json")
        # weight rounds by level voxels; t_ws = c * sum(rounds_l * vox_l)
        wsum = sum(e["rounds"] * (e["shape"][0] * e["shape"][1] * e["shape"][2])
                   for e in single)
        c = st["watershed"] / wsum
        t_round = [c * s ** 3 for s in lvl_shapes]

    ws_comm_bytes = 0.0
    ws_compute = 0.0
    for s, r, tr in zip(lvl_shapes, sh_rounds, t_round):
        # compute: each shard sweeps 1/N of the level's voxels (+2 ghost
        # planes; overhead = 2 / (s/N) per round, folded in)
        local_planes = max(1, s // N)
        ws_compute += r * tr / N * (local_planes + 2) / local_planes
        # comm: 3 arrays (rank, lab, f) x 2 planes x Y_l*X_l x 4 B
        ws_comm_bytes += r * 3 * 2 * (s * s) * 4
    # gradient setup: 2 int32 halos at fine level
    ws_comm_bytes += 2 * 2 * n * n * 4
    t_ws8 = ws_compute + ws_comm_bytes / ICI_BPS

    # ---- marching (extract/emit/materialize/dedup) ----------------------
    stats = counts["surface"]
    checks = stats["checks"]                       # per-shard rows
    T_total = st["n_tris"]
    # CPU-mesh collect may run at a smaller size; scale shard fractions,
    # not absolute counts
    tris_shard = [row[1] for row in checks]
    frac_max_shard = max(tris_shard) / max(1, sum(tris_shard))
    # sort is O(M log M)
    import math

    M = 3 * T_total
    M_s = M * frac_max_shard
    sort_ratio = (M_s * math.log(max(M_s, 2))) / (M * math.log(M))
    # mc stage time splits ~ (extract+emit+materialize) linear in per-shard
    # grid/tris + dedup sort.  bench_profile measures mc as one number;
    # BASELINE round-3 split: extract 0.90 emit 0.12 materialize 0.87
    # dedup 1.20 (sums ~3.0 for the pre-cut pipeline).  Use the measured
    # total and apportion by those weights.
    w_linear, w_sort = 0.60, 0.40
    t_mc8 = st["mc"] * (w_linear * frac_max_shard * N / 1.0 / N
                        + w_sort * sort_ratio)
    # ^ linear part: frac_max_shard of the work per shard (perfectly
    #   parallel); sort part: per-shard sorted length ratio
    mc_comm = 2 * Yp * Xp * 1 + stats["bound"] * 4  # mask halos + id stitch
    cuts = stats.get("cuts")
    if cuts and len({b - a for a, b in zip(cuts, cuts[1:])}) > 1:
        # balanced repartition: worst-case every slice moves shards
        # (one u8 volume all-to-all over ICI; ~3 ms at 512^3)
        Zg = cuts[-1]
        mc_comm += Zg * Yp * Xp * 1
    t_mc8 += mc_comm / ICI_BPS

    # ---- ca smoothing ---------------------------------------------------
    verts_shard_frac = frac_max_shard  # verts track tris per shard
    # taubin: count the gathered COLUMNS the sharded smoother actually
    # issues per pass — masked rows of a padded static bucket still
    # gather, so the model must charge the PADDED widths, not real
    # vertex counts.  Interior three-level table (sharded_ops.py):
    # LO=6 rows x vbucket + 2 rows x vbucket/4 (deg>6) + 8 rows x
    # vbucket/64 (deg>8).  Ring: two raw halves of (2*MAXD=32, B_RING)
    # plus ~3 B_RING-wide position/update gathers.  The single-chip
    # bucketed pass measures 7.9 effective columns/vertex
    # (2.899 s / (20 passes x 3.08M verts x ~6 ns/column)); the sharded
    # time scales from the measured single-chip taubin by column count.
    Vb = stats.get("vbucket", stats["max_tris"])
    Bring = stats.get("b_ring", stats["bound"])
    if "vbucket" in stats:
        idx_interior = 6 * Vb + 2 * max(1024, Vb // 4) \
            + 8 * max(1024, Vb // 64)
    else:  # counts predate the three-level table: two-level LO=8 model
        idx_interior = 8 * Vb + 8 * max(1024, Vb // 8)
    idx_ring = 2 * 32 * Bring + 3 * Bring
    # collect at a smaller size: scale bucket widths by total tris
    scale = T_total / max(1, sum(tris_shard))
    idx_sharded = (idx_interior + idx_ring) * scale
    idx_single = 7.9 * st["n_verts"]
    t_taubin8 = st["ca_taubin"] * idx_sharded / idx_single
    t_ca_gathers = (t_taubin8 + (st["ca_adjacency"]
                    + st["ca_staircase"] + st["ca_normals"]
                    + st["ca_weights"]) * verts_shard_frac)
    t_ca_grid = (st["ca_rasterize"] + st["ca_chamfer"]) / N
    n_iters, steps = 10, 6
    ca_comm = (6 * Bring * 4                              # staircase minmax
               + steps * 3 * Yp * Xp * 4                  # chamfer ghosts
               + n_iters * 2 * (4 + 3) * Bring * 4)       # taubin rings
    t_ca8 = t_ca_gathers + t_ca_grid + ca_comm / ICI_BPS

    # ---- export ---------------------------------------------------------
    # per-shard f16 verts d2h (faces stream during smoothing already, the
    # 8-chip analog of rule 21); on a real v5e host this is PCIe over 8
    # parallel device queues, not the dev relay.  The record pack is
    # native/meshpack.cpp stl_pack_mt: independent fixed-size rows split
    # across host cores (single-core rate MEASURED 425 MB/s on this dev VM
    # — gather-bound, so a conservative floor for a healthy host), and the
    # write_stl_from_device pipeline overlaps pack chunks with the page-
    # cache write (assumed 3 GB/s streaming, no fsync — the reference's
    # vtkSTLWriter does not fsync either).
    vert_bytes = st["n_verts"] * 3 * 2
    rec_bytes = st["n_tris"] * 50
    PACK_BPS_CORE = 425e6            # measured, tools/project8.py r5
    WRITE_BPS = 3e9                  # page-cache streaming write
    t_pack = rec_bytes / (PACK_BPS_CORE * HOST_CORES)
    t_write = rec_bytes / WRITE_BPS
    t_export_pcie = vert_bytes / PCIE_D2H_BPS + max(t_pack, t_write)
    t_export_relay = st["mesh_to_host"] + st["stl"]

    t_total8 = t_ws8 + t_mc8 + t_ca8 + t_export_pcie
    single_total = (st["watershed"] + st["mask"] + st["mc"]
                    + st["ca_normals"] + st["ca_staircase"]
                    + st["ca_adjacency"] + st["ca_rasterize"]
                    + st["ca_chamfer"] + st["ca_weights"] + st["ca_taubin"]
                    + t_export_relay)

    comm_mb = (ws_comm_bytes + mc_comm + ca_comm) / 1e6
    rows = [
        ("watershed", st["watershed"], t_ws8,
         f"{sh_rounds} rounds, {ws_comm_bytes / 1e6:.0f} MB halo"),
        ("marching+dedup", st["mc"], t_mc8,
         f"max-shard {frac_max_shard:.3f} of tris, sort ratio {sort_ratio:.3f}"),
        ("ca-smoothing", sum(st[k] for k in (
            "ca_normals", "ca_staircase", "ca_adjacency", "ca_rasterize",
            "ca_chamfer", "ca_weights", "ca_taubin")), t_ca8,
         f"{ca_comm / 1e6:.1f} MB ring/ghost comm"),
        ("export tail", t_export_relay, t_export_pcie,
         f"{vert_bytes / 1e6:.0f} MB f16 verts over host PCIe, not relay"),
    ]
    result = {
        "basis": {"single_chip_stages_s": st,
                  "sharded_rounds": sh_rounds,
                  "collect_size": counts["size"],
                  "per_round_s": (tpu or {}).get("per_round_s"),
                  "ici_bytes_per_s": ICI_BPS,
                  "pcie_d2h_bytes_per_s": PCIE_D2H_BPS},
        "comm_MB_total": round(comm_mb, 1),
        "projected_stages_s": {r[0]: round(r[2], 3) for r in rows},
        "single_chip_total_s": round(single_total, 2),
        "projected_v5e8_total_s": round(t_total8, 2),
        "speedup": round(single_total / t_total8, 2),
    }

    log(f"\n=== v5e-8 projection at {n}^3 "
        f"(comm total {comm_mb:.1f} MB, ICI @ {ICI_BPS / 1e9:.0f} GB/s) ===")
    log(f"{'stage':>16} {'1 chip':>8} {'8 chips':>9}  basis")
    for name, t1, t8, why in rows:
        log(f"{name:>16} {t1:>7.2f}s {t8:>8.3f}s  {why}")
    log(f"{'TOTAL':>16} {single_total:>7.2f}s {t_total8:>8.2f}s  "
        f"(speedup {single_total / t_total8:.1f}x)")
    with open(os.path.join(REPO, "PROJECT8.json"), "w") as fh:
        json.dump(result, fh, indent=1)
    if emit_json:
        print(json.dumps(result), flush=True)
    return result


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    if "--collect" in argv:
        size = int(argv[argv.index("--collect") + 1])
        doc = collect(size, skip_single="--skip-single" in argv,
                      label_only="--label-only" in argv,
                      surface_only="--surface-only" in argv)
        path = os.path.join(REPO, ".project8_counts.json")
        with open(path, "w") as fh:
            json.dump(doc, fh, indent=1)
        log(f"wrote {path}")
    elif "--tpu-probe" in argv:
        doc = tpu_probe()
        path = os.path.join(REPO, ".project8_tpu.json")
        with open(path, "w") as fh:
            json.dump(doc, fh, indent=1)
        log(f"wrote {path}")
    else:
        project()


if __name__ == "__main__":
    main()
