"""Real-data readiness kit (VERDICT round-2 item 5, BASELINE.json:2).

The metric of record — TUM fr1/desk ATE RMSE — has never been measurable in
this environment (no dataset on disk, no network; SURVEY.md §0). This tool
makes the FIRST real run a non-event: pointed at any TUM or ICL-NUIM
directory it validates every assumption the pipeline makes about on-disk
data, then prints the exact commands that produce the ATE of record.

Checks (each prints PASS/FAIL/WARN + evidence):
  1. layout       rgb.txt/depth.txt exist and referenced files resolve
                  (or the raw ICL-NUIM POV-Ray layout is detected)
  2. association  rgb<->depth timestamp pairing coverage + max gap at the
                  benchmark 20 ms tolerance
  3. decode       16-bit depth PNGs decode BIT-IDENTICALLY via the native
                  C++ core and OpenCV (byte order is the classic failure:
                  big-endian PNG read as LE shows up as x256 values)
  4. depth scale  depth/5000 lands in a physically plausible indoor range
                  (0.2-15 m median); x256/÷256 byte-order artifacts and
                  wrong-scale (mm vs 1/5000) data are called out
  5. intrinsics   which preset the directory name implies, whether
                  intrinsics.txt overrides, image size vs preset size
  6. groundtruth  GT file parses, frame<->GT association coverage, inter-
                  frame motion magnitudes consistent with handheld video
  7. commands     the odom/slam/eval invocations for the ATE of record

Run:  python tools/verify_dataset.py <dataset_dir>
Exit code 0 iff no FAIL. The hermetic gate in
tests/integration/test_verify_dataset.py runs this against the synthetic
TUM fixture.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

_RESULTS = []


def _report(status: str, name: str, msg: str):
    _RESULTS.append((status, name, msg))
    print(f"[{status:4s}] {name}: {msg}")


def _is_raw_icl(root: str) -> bool:
    try:
        names = os.listdir(root)
    except OSError:
        return False
    return any(n.endswith(".depth") for n in names) and not os.path.exists(
        os.path.join(root, "depth.txt")
    )


def check_layout(root: str) -> str:
    """Returns 'tum' | 'icl_raw' | '' (fail)."""
    if _is_raw_icl(root):
        n_depth = sum(1 for n in os.listdir(root) if n.endswith(".depth"))
        gts = [n for n in os.listdir(root) if n.endswith(".gt.freiburg")]
        _report(
            "PASS",
            "layout",
            f"raw ICL-NUIM POV-Ray layout: {n_depth} .depth frames, "
            f"gt={gts[0] if gts else 'MISSING'}",
        )
        return "icl_raw"
    ok = True
    for f in ("rgb.txt", "depth.txt"):
        if not os.path.exists(os.path.join(root, f)):
            _report("FAIL", "layout", f"missing {f} (not a TUM-format dir)")
            ok = False
    if not ok:
        return ""
    from rgbd_pose_estimation_tpu.data.tum import _read_file_list

    missing = 0
    for lst in ("rgb.txt", "depth.txt"):
        _, files = _read_file_list(os.path.join(root, lst))
        for f in files[:: max(1, len(files) // 50)]:  # sample ~50
            if not os.path.exists(os.path.join(root, f)):
                missing += 1
    if missing:
        _report("FAIL", "layout", f"{missing} referenced files missing on disk")
        return ""
    _report("PASS", "layout", "TUM layout, referenced files resolve")
    return "tum"


def check_association(root: str):
    from rgbd_pose_estimation_tpu.data.tum import TumSequence, _read_file_list

    seq = TumSequence(root)
    rgb_ts, _ = _read_file_list(os.path.join(root, "rgb.txt"))
    dep_ts, _ = _read_file_list(os.path.join(root, "depth.txt"))
    n = len(seq)
    if n == 0:
        _report("FAIL", "association", "0 associated frames at 20 ms tolerance")
        return None
    cov = n / max(min(len(rgb_ts), len(dep_ts)), 1)
    # Max associated gap, recomputed here as evidence.
    from rgbd_pose_estimation_tpu.eval.traj_io import associate_timestamps

    ia, ib = associate_timestamps(rgb_ts, dep_ts, 0.02)
    gap = float(np.abs(rgb_ts[ia] - dep_ts[ib]).max()) if len(ia) else 0.0
    status = "PASS" if cov > 0.8 else "WARN"
    _report(
        status,
        "association",
        f"{n} frames associated ({cov*100:.0f}% of streams), max gap {gap*1e3:.1f} ms",
    )
    return seq


def check_decode(root: str, seq) -> None:
    import cv2

    from rgbd_pose_estimation_tpu.data import native_loader

    probes = [0, len(seq) // 2, len(seq) - 1]
    native_ok = native_loader._load() is not None
    worst = 0
    for i in probes:
        path = os.path.join(seq.root, seq.depth_files[i])
        ref = cv2.imread(path, cv2.IMREAD_UNCHANGED)
        if ref is None:
            _report("FAIL", "decode", f"cv2 cannot read {path}")
            return
        if ref.dtype != np.uint16:
            _report(
                "FAIL",
                "decode",
                f"{path}: depth dtype {ref.dtype}, expected uint16 "
                "(8-bit depth PNGs cannot carry TUM 1/5000 range)",
            )
            return
        if native_ok:
            nat = native_loader.decode_depth16(path)
            if nat.shape != ref.shape or not np.array_equal(nat, ref):
                nd = int(np.sum(nat != ref)) if nat.shape == ref.shape else -1
                # The classic byte-order failure: one decoder applying the
                # PNG big-endian convention and the other not differs by
                # exactly a byteswap.
                swapped = (
                    nat.shape == ref.shape
                    and np.array_equal(nat.byteswap(), ref)
                )
                _report(
                    "FAIL",
                    "decode",
                    f"native vs cv2 mismatch on {path}: {nd} px differ"
                    + (" — BYTESWAP (16-bit endianness bug)" if swapped else ""),
                )
                return
        worst = max(worst, int(ref.max()))
    src = "native==cv2 bit-identical" if native_ok else "cv2 only (native lib unavailable)"
    _report("PASS", "decode", f"{len(probes)} probe frames, {src}, max raw {worst}")


def check_depth_scale(seq) -> None:
    _, _, depth = seq.frame(0)
    valid = depth[depth > 0]
    if valid.size == 0:
        _report("WARN", "depth-scale", "frame 0 has no valid depth")
        return
    med = float(np.median(valid))
    if 0.2 <= med <= 15.0:
        _report(
            "PASS",
            "depth-scale",
            f"median depth {med:.2f} m at 1/5000 (indoor-plausible), "
            f"valid {valid.size/depth.size*100:.0f}%",
        )
    elif med > 50.0:
        _report(
            "FAIL",
            "depth-scale",
            f"median {med:.1f} m — x256 byte-order artifact or millimeter "
            "scale (use scale 1/1000?)",
        )
    else:
        _report("WARN", "depth-scale", f"median {med:.2f} m outside 0.2-15 m")

    # Spatial-smoothness check: a byteswapped 16-bit depth map often stays
    # range-plausible (u16 byteswap of 5k-30k lands in 2k-60k) but becomes
    # high-frequency noise — the low byte's fine variation lands in the
    # high byte. Real depth is locally smooth: the MEDIAN |Δ| between
    # horizontally adjacent valid pixels is millimeters (speckle/edges only
    # move the tail, not the median).
    a, b = depth[:, :-1], depth[:, 1:]
    both = (a > 0) & (b > 0)
    if both.sum() > 100:
        dmed = float(np.median(np.abs(a[both] - b[both])))
        # Absolute bound: real RGB-D surfaces step a few mm/pixel at the
        # median (even at coarse resolution); a byteswap multiplies the
        # smooth low-byte variation by 256 (>= 0.05 m steps at 1/5000).
        if dmed > 0.05:
            _report(
                "FAIL",
                "depth-smooth",
                f"median adjacent-pixel depth step {dmed:.3f} m vs median "
                f"depth {med:.2f} m — depth is spatial noise (byteswapped "
                "16-bit PNG or corrupt data)",
            )
        else:
            _report(
                "PASS",
                "depth-smooth",
                f"median adjacent-pixel step {dmed*1e3:.1f} mm (smooth)",
            )


def guess_intrinsics(root: str):
    name = os.path.basename(os.path.normpath(root)).lower()
    if "freiburg1" in name or "fr1" in name:
        return "tum_fr1"
    if "icl" in name or "living_room" in name or "office" in name or _is_raw_icl(root):
        return "icl_nuim"
    return "tum_default"


def check_intrinsics(root: str, seq) -> str:
    from rgbd_pose_estimation_tpu.core.camera import CameraIntrinsics

    override = os.path.join(root, "intrinsics.txt")
    if os.path.exists(override):
        vals = open(override).read().split()
        _report(
            "PASS",
            "intrinsics",
            f"intrinsics.txt present (fx={vals[0]}, fy={vals[1]}) — use "
            "--intrinsics from_dataset",
        )
        return "from_dataset"
    preset = guess_intrinsics(root)
    cam = {
        "tum_fr1": CameraIntrinsics.tum_fr1(),
        "tum_default": CameraIntrinsics.tum_default(),
        "icl_nuim": CameraIntrinsics(481.2, 480.0, 319.5, 239.5, 640, 480),
    }[preset]
    _, gray, _ = seq.frame(0)
    h, w = gray.shape
    if (w, h) != (cam.width, cam.height):
        _report(
            "WARN",
            "intrinsics",
            f"preset {preset} is {cam.width}x{cam.height} but frames are "
            f"{w}x{h} — intrinsics will be auto-scaled; verify fx/fy",
        )
    else:
        _report(
            "PASS",
            "intrinsics",
            f"directory implies --intrinsics {preset} "
            f"(fx={cam.fx}, {cam.width}x{cam.height} matches frames)",
        )
    return preset


def check_groundtruth(seq) -> bool:
    if seq.gt_timestamps is None:
        _report(
            "WARN",
            "groundtruth",
            "no groundtruth.txt — odometry runs, ATE of record impossible",
        )
        return False
    idx, poses = seq.groundtruth_aligned()
    cov = len(idx) / max(len(seq), 1)
    if cov < 0.5:
        _report(
            "FAIL",
            "groundtruth",
            f"only {cov*100:.0f}% of frames have GT within 20 ms",
        )
        return False
    rel = np.linalg.norm(np.diff(poses[:, :3, 3], axis=0), axis=-1)
    step = float(np.median(rel)) if len(rel) else 0.0
    status = "PASS" if step < 0.2 else "WARN"
    _report(
        status,
        "groundtruth",
        f"{len(idx)} frames matched ({cov*100:.0f}%), median inter-frame "
        f"motion {step*1e3:.1f} mm ({'handheld-plausible' if step < 0.2 else 'LARGE — check units/format'})",
    )
    return True


def main(root: str) -> int:
    # Reset: a second invocation in the same process must not double-count
    # earlier checks in the summary/exit code.
    del _RESULTS[:]
    print(f"# Dataset readiness: {root}\n")
    kind = check_layout(root)
    if not kind:
        return 1
    if kind == "icl_raw":
        from rgbd_pose_estimation_tpu.data.icl_nuim import IclNuimSequence

        seq = IclNuimSequence(root)
        _report("PASS", "icl-load", f"{len(seq)} raw ICL frames load")
        intr = "icl_nuim"
        has_gt = seq.gt_timestamps is not None
    else:
        seq = check_association(root)
        if seq is None:
            return 1
        check_decode(root, seq)
        check_depth_scale(seq)
        intr = check_intrinsics(root, seq)
        has_gt = check_groundtruth(seq)

    fails = sum(1 for s, _, _ in _RESULTS if s == "FAIL")
    print(f"\n# {len(_RESULTS)} checks: {fails} FAIL, "
          f"{sum(1 for s, _, _ in _RESULTS if s == 'WARN')} WARN")
    if fails == 0:
        print("\n# ATE-of-record commands (BASELINE.json:2 metric of record):")
        print(f"python -m rgbd_pose_estimation_tpu.cli.main odom \\")
        print(f"    --dataset {root} --out traj_odom.txt --intrinsics {intr} --pose-graph")
        print(f"python -m rgbd_pose_estimation_tpu.cli.main slam \\")
        print(f"    --dataset {root} --out traj_slam.txt --intrinsics {intr} --mesh-devices 1")
        if has_gt:
            print(f"python -m rgbd_pose_estimation_tpu.cli.main eval \\")
            print(f"    --est traj_slam.txt --gt {os.path.join(root, 'groundtruth.txt')}")
        else:
            print("# (no groundtruth.txt: obtain GT to compute the ATE)")
    return 1 if fails else 0


if __name__ == "__main__":
    if len(sys.argv) != 2:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1]))
