"""Generate golden parity fixtures from the PyTorch reference.

Runs the *actual* reference implementation (mounted read-only at
/root/reference) on CPU in float64 and records rendered images and
pixel-loss→parameter gradients as .npz fixtures under tests/golden/.
The test suite (tests/test_golden_parity.py) then compares the JAX
framework against these fixtures without needing torch or the reference
mount at test time.

Construction-dtype note: the reference builds its camera ray grid and
normal-offset constants in float32 regardless of module dtype
(rendering/ray_marching.py:42,96-113). For tight float64 parity this script
overwrites those buffers with float64 values computed here from the same
formulas (pixel-center affine_grid convention, tetrahedral offsets); the
framework's Camera(grid_dtype=float64)/NormalsEstimator use identical
formulas, so both sides share bit-identical constants.

Usage:  python tools/gen_golden.py   (requires /root/reference and torch)
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
REFERENCE = Path(os.environ.get("REFERENCE_PATH", "/root/reference"))
OUT_DIR = REPO / "tests" / "golden"

sys.path.insert(0, str(REFERENCE))
os.chdir(REFERENCE)  # Shader loads ./data/cyclic_cmap.pt CWD-relative.

import torch  # noqa: E402

torch.set_default_dtype(torch.float64)

import quaternion as Q  # noqa: E402  (reference module)
from rendering.ray_marching import SDFMarcher, SDFNormals  # noqa: E402
from rendering.shader import Shader  # noqa: E402
from scene import scene_registry  # noqa: E402
from scene.primitives import SDFBox, SDFSphere, SDFTorus  # noqa: E402
from scene.transformations import SDFAffineTransformation, SDFSmoothUnion  # noqa: E402

DTYPE = torch.float64


def pixel_grid_f64(width, height, focal_length, sensor_w, sensor_h):
    """Pixel-center ray grid, float64 (same formula as ray_marching_tpu.camera)."""
    xs = (2.0 * np.arange(width, dtype=np.float64) + 1.0) / width - 1.0
    ys = (2.0 * np.arange(height, dtype=np.float64) + 1.0) / height - 1.0
    positions = np.zeros((height, width, 3), dtype=np.float64)
    positions[:, :, 0] = (sensor_w / 2.0) * xs[None, :]
    positions[:, :, 1] = (-sensor_h / 2.0) * ys[:, None]
    focus = np.asarray([0.0, 0.0, -focal_length])
    rel = positions - focus
    directions = rel / np.linalg.norm(rel, axis=-1, keepdims=True)
    return positions, directions


def tetra_offsets_f64(eps):
    tet = np.asarray(
        [
            [1.0, 0.0, -np.sqrt(0.5)],
            [-1.0, 0.0, -np.sqrt(0.5)],
            [0.0, 1.0, np.sqrt(0.5)],
            [0.0, -1.0, np.sqrt(0.5)],
        ]
    )
    unit = tet / np.linalg.norm(tet, axis=-1, keepdims=True)
    offsets = unit * eps
    inverse = np.linalg.inv(offsets[1:4] - offsets[0:1])
    return offsets, inverse


def mangle(torch_name: str) -> str:
    """Map a torch named_parameters path to a framework param_paths path.

    sdfs.{i}.* → c{i}/*, sdf.* → child/*; leaf names are shared.
    """
    tokens = torch_name.split(".")
    out = []
    i = 0
    while i < len(tokens):
        if tokens[i] == "sdfs":
            out.append(f"c{tokens[i + 1]}")
            i += 2
        elif tokens[i] == "sdf":
            out.append("child")
            i += 1
        else:
            out.append(tokens[i])
            i += 1
    return "/".join(out)


def make_composite_torch():
    """Reference-module build of the framework's 'composite' registry scene."""
    return SDFSmoothUnion(
        sdfs=[
            SDFAffineTransformation(
                orientation=[0.9014, 0.25, 0.25, 0.25],
                translation=[0.6, 0.0, 0.5],
                sdf=SDFBox(halfsides=(0.3, 0.2, 0.25)),
            ),
            SDFSphere(radius=0.4),
            SDFAffineTransformation(
                orientation=[0.5**0.5, 0.5**0.5, 0.0, 0.0],
                translation=[-0.5, 0.2, 0.6],
                sdf=SDFTorus(radius1=0.6, radius2=0.15),
            ),
        ],
        blend_k=16.0,
    )


SCENES = {
    "test_scene": scene_registry.make_test_scene,
    "test_scene2": scene_registry.make_test_scene2,
    "single_sphere": lambda: SDFSphere(radius=0.5),
    "composite": make_composite_torch,
}

def _unit(q):
    q = np.asarray(q, dtype=np.float64)
    return tuple(q / np.linalg.norm(q))


# Stability mask: pixels whose rays converged onto a surface (|f| small) and
# did not diverge to infinity. Rays that miss the scene march to astronomical
# distances where float rounding dominates — both frameworks produce chaos
# there, so parity is only well-defined on the stable set. Closed scenes
# (rooms) have an all-true mask. Global-normalization shader modes (1, 2, 5)
# couple every pixel through whole-image min/max; where those reductions are
# dominated by chaotic pixels the comparison is skipped per-fixture below.
STABLE_ABS_F = 1e-2
STABLE_MAX_POS = 10.0

ALL_MODES = tuple(range(8))

CONFIGS = [
    # Closed room scene, generic symmetry-breaking pose outside the torus
    # tube: every ray converges, all modes comparable, images and grads.
    dict(
        name="scene2_room",
        scene="test_scene2",
        width=96,
        height=64,
        steps=32,
        normals_eps=5e-2,
        orientation=_unit((0.99, 0.03, -0.05, 0.02)),
        translation=(0.1, 0.2, 2.0),
        degree=2,
        image_modes=ALL_MODES,
        grad_modes=ALL_MODES,
    ),
    # Open scene (rays can miss): exercises stability-masked comparison.
    # Mode 5 grads are skipped: the laplacian shader's global max |L| is
    # attained at a diverged pixel whose value is rounding chaos, so its
    # gradient routing is not reproducible in either framework.
    dict(
        name="scene1_rotated",
        scene="test_scene",
        width=80,
        height=60,
        steps=32,
        normals_eps=5e-2,
        orientation=(0.9770050188616662, 0.10178177279809028,
                     0.15267265919713543, 0.10178177279809028),
        translation=(0.1, 0.3, -2.0),
        degree=1,
        image_modes=ALL_MODES,
        grad_modes=(0, 1, 2, 3, 4, 6, 7),
    ),
    # BASELINE config 1 at spec resolution: lone sphere, 256², 64 steps,
    # deep divergence on miss rays. Mode 5 excluded entirely (max |L|
    # chaos, see above).
    dict(
        name="sphere_depth",
        scene="single_sphere",
        width=256,
        height=256,
        steps=64,
        normals_eps=5e-2,
        orientation=(1.0, 0.0, 0.0, 0.0),
        translation=(0.0, 0.0, -2.0),
        degree=1,
        image_modes=(0, 1, 2, 3, 4, 6, 7),
        grad_modes=(0, 1, 2, 3, 4, 6, 7),
    ),
    # BASELINE config 2 at spec resolution: smooth-union composite under
    # quaternion rotations, 512². Gradient fixtures cover every shader
    # gradient class at spec resolution except mode 1 (distance — same
    # global-min/max routing as mode 2, pinned there and at smaller sizes
    # above): geometry (0), normalization (2), pixel-frame (3, vignette),
    # global-max (5), cmap-gather tangent (6) and spin (7). Modes 3/6
    # added round 3 (VERDICT r2 #6); regeneration of this fixture with all
    # six grad modes: 16m42s wall (f64 CPU torch; two more 512² reference
    # backwards vs round 2's four).
    dict(
        name="composite_512",
        scene="composite",
        width=512,
        height=512,
        steps=48,
        normals_eps=5e-2,
        orientation=(0.9914448613738104, 0.0, 0.13052619222005157, 0.0),
        translation=(0.3, 0.1, -1.8),
        degree=2,
        image_modes=ALL_MODES,
        grad_modes=(0, 2, 3, 5, 6, 7),
    ),
    # BASELINE config 3 geometry: full registry scene, all 8 shaders, ONE
    # REFLECTION BOUNCE, at 512² (nearest feasible to the 1024² spec for
    # the f64 CPU oracle; the closed room keeps every ray stable). The
    # bounce composes reference modules with the reference mirror formula
    # (control.py:179-194) exactly like the framework's _march.
    dict(
        name="scene2_bounce_512",
        scene="test_scene2",
        width=512,
        height=512,
        steps=32,
        normals_eps=5e-2,
        reflection_bounces=1,
        orientation=_unit((0.99, 0.03, -0.05, 0.02)),
        translation=(0.1, 0.2, 2.0),
        degree=2,
        image_modes=ALL_MODES,
        grad_modes=(0, 1, 4, 7),
    ),
    # BASELINE config 3 at SPEC resolution: 1024², all 8 shaders, one
    # bounce. Images (and the random loss weights) are stored float32 to
    # bound fixture size — the math still runs in f64 on both sides, the
    # f32 round-trip only caps image comparison at ~1e-7 relative (the
    # parity test keys its tolerance off the stored dtype). The weights
    # are rounded through f32 *before* the torch backward so both
    # frameworks consume bit-identical cotangents. Grad modes restricted
    # to the geometry + cmap-gather classes (the full grad matrix is
    # pinned at 512² above).
    dict(
        name="scene2_bounce_1024",
        scene="test_scene2",
        width=1024,
        height=1024,
        steps=32,
        normals_eps=5e-2,
        reflection_bounces=1,
        orientation=_unit((0.99, 0.03, -0.05, 0.02)),
        translation=(0.1, 0.2, 2.0),
        degree=2,
        image_modes=ALL_MODES,
        grad_modes=(0, 7),
        store_f32=True,
    ),
]


def render_reference(cfg):
    scene = SCENES[cfg["scene"]]().to(DTYPE)
    w, h = cfg["width"], cfg["height"]
    px_size = 3.45e-6
    focal, sw, sh = px_size * h, px_size * w, px_size * h

    positions, directions = pixel_grid_f64(w, h, focal, sw, sh)
    ray_pos0 = torch.from_numpy(positions)[None]  # (1, H, W, 3)
    ray_dir0 = torch.from_numpy(directions)[None]

    marcher = SDFMarcher(scene)
    normals_mod = SDFNormals(scene, normals_eps=cfg["normals_eps"]).to(DTYPE)
    offsets, inverse = tetra_offsets_f64(cfg["normals_eps"])
    normals_mod.offsets = torch.from_numpy(offsets)
    normals_mod.offsets_inverse = torch.from_numpy(inverse)
    shader = Shader().to(DTYPE)
    so3 = Q.QuaternionToSO3().to(DTYPE)

    orientation = torch.tensor([cfg["orientation"]], dtype=DTYPE, requires_grad=True)
    translation = torch.tensor([cfg["translation"]], dtype=DTYPE, requires_grad=True)
    bounces = int(cfg.get("reflection_bounces", 0))

    def march_with_bounces(ray_pos, ray_dirs):
        """March + optional mirror bounces: the reference reflection formula
        v' = v + 2⟨N, −v⟩N (control.py:179-194; never called there) composed
        with its marcher/normals modules, mirroring the framework's _march
        (escape the |f| ≈ 0 shell by normals_eps before re-marching)."""
        marched = marcher(ray_pos, ray_dirs, cfg["steps"])
        for _ in range(bounces):
            n, _ = normals_mod(marched)
            proj = (n * ray_dirs.mul(-1)).sum(dim=-1, keepdim=True) * n
            ray_dirs = proj * 2 + ray_dirs
            marched = marcher(
                marched + ray_dirs * cfg["normals_eps"], ray_dirs, cfg["steps"]
            )
        return marched, ray_dirs

    def stability_mask():
        with torch.no_grad():
            q = orientation[:, None, None, :]
            ray_pos = Q.rotation(ray_pos0, q) + translation[:, None, None, :]
            ray_dirs = Q.rotation(ray_dir0, q)
            marched, _ = march_with_bounces(ray_pos, ray_dirs)
            f = scene(marched)
            ok = (f.abs() < STABLE_ABS_F) & (
                marched.norm(dim=-1, keepdim=True) < STABLE_MAX_POS
            )
        return ok.numpy()  # (1, H, W, 1) bool

    def forward(mode):
        q = orientation[:, None, None, :]
        ray_pos = Q.rotation(ray_pos0, q) + translation[:, None, None, :]
        ray_dirs = Q.rotation(ray_dir0, q)
        pixel_frames = so3(orientation[:, None, None, :])
        marched, ray_dirs = march_with_bounces(ray_pos, ray_dirs)
        surface_distances = scene(marched)
        surface_normals, surface_laplacian = normals_mod(marched)
        image = shader(
            ray_pos,
            orientation,
            pixel_frames,
            ray_dirs,
            marched,
            surface_normals,
            surface_laplacian,
            surface_distances,
            mode=mode,
            degree=cfg["degree"],
        ).expand(-1, h, w, 3)
        return image

    out = {}
    rng = np.random.default_rng(0)
    mask = stability_mask()
    out["stable_mask"] = mask
    # Gradients flow only through stable pixels: the loss is masked on both
    # sides, so chaotic (diverged / unconverged) rays carry no cotangent.
    weights_np = rng.standard_normal((1, h, w, 3)) * mask
    if cfg.get("store_f32"):
        # Round through f32 BEFORE use: stored f32 == values consumed here.
        weights_np = weights_np.astype(np.float32).astype(np.float64)
    loss_weights = torch.from_numpy(weights_np)
    for mode in range(8):
        want_image = mode in cfg["image_modes"]
        want_grads = mode in cfg["grad_modes"]
        if not (want_image or want_grads):
            continue
        if orientation.grad is not None:
            orientation.grad = None
            translation.grad = None
        for p in scene.parameters():
            p.grad = None
        if not want_grads:
            with torch.no_grad():
                out[f"image_{mode}"] = forward(mode).numpy()
            continue
        image = forward(mode)
        if want_image:
            out[f"image_{mode}"] = image.detach().numpy()
        loss = (image * loss_weights).sum()
        loss.backward()
        for tname, p in scene.named_parameters():
            g = p.grad
            out[f"grad_{mode}/{mangle(tname)}"] = (
                np.zeros(p.shape) if g is None else g.detach().numpy()
            )
        for cam_name, leaf in (
            ("camera_orientation", orientation),
            ("camera_translation", translation),
        ):
            g = leaf.grad
            out[f"grad_{mode}/{cam_name}"] = (
                np.zeros(leaf.shape) if g is None else g.detach().numpy()
            )
    out["loss_weights"] = loss_weights.numpy()
    for key in ("width", "height", "steps", "normals_eps", "degree"):
        out[f"meta_{key}"] = np.asarray(cfg[key])
    out["meta_orientation"] = np.asarray(cfg["orientation"])
    out["meta_translation"] = np.asarray(cfg["translation"])
    out["meta_reflection_bounces"] = np.asarray(bounces)
    out["meta_scene"] = np.asarray(cfg["scene"])
    out["meta_image_modes"] = np.asarray(cfg["image_modes"])
    out["meta_grad_modes"] = np.asarray(cfg["grad_modes"])
    return out


def main():
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    only = set(sys.argv[1:])  # no args = all fixtures
    for cfg in CONFIGS:
        if only and cfg["name"] not in only:
            continue
        print(f"generating {cfg['name']} ...", flush=True)
        with torch.autograd.set_detect_anomaly(False):
            data = render_reference(cfg)
        if cfg.get("store_f32"):
            for key, val in data.items():
                if key.startswith("image_") or key == "loss_weights":
                    data[key] = val.astype(np.float32)
        path = OUT_DIR / f"{cfg['name']}.npz"
        np.savez_compressed(path, **data)
        print(f"  wrote {path} ({path.stat().st_size / 1e6:.2f} MB)")


if __name__ == "__main__":
    main()
