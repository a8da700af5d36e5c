"""Synthetic event-camera dataset generator (a miniature ESIM).

Produces a complete dataset in the reference's on-disk layout
(SURVEY.md section 2.1, scripts/preprocess_esim.py:229-259):

  raw_events.npz          {position (N,2) u16, timestamp (N,) i64 ns,
                           polarity (N,) bool}
  camera_poses.npz        {T_wc_position, T_wc_orientation (XYZW quats),
                           T_wc_timestamp i64 ns}
  camera_calibration.npz  {img_height, img_width, distortion_model,
                           distortion_params, intrinsics, bayer_pattern,
                           pos/neg_contrast_threshold, refractory_period}
  renderer_params.npz     {interm_color_space, log_eps}
  views/transforms_{train,val,test}.json + 8-bit BGRA PNGs (OpenGL poses)

Scene: an opaque textured unit sphere on a white background, camera orbiting
with optionally non-uniform angular speed.  Events are generated per pixel
by linear log-intensity interpolation between densely rendered frames and
contrast-threshold crossing extraction — the standard ESIM model with zero
refractory period.  Because the scene is analytic, tests and benchmarks get
ground-truth novel views for free.
"""

from __future__ import annotations

import json
import os

import cv2
import numpy as np

GAMMA = 2.2


# ----------------------------------------------------------------------------
# analytic scene
# ----------------------------------------------------------------------------

def sphere_texture(normal):
    """Smooth positive texture on the unit sphere, values in ~[0.05, 0.95]."""
    x, y, z = normal[..., 0], normal[..., 1], normal[..., 2]
    value = (
        0.5
        + 0.22 * np.sin(4.0 * x + 1.0) * np.cos(3.0 * y)
        + 0.18 * np.sin(5.0 * z + 0.5)
        + 0.06 * np.sin(8.0 * x * y + 2.0)
    )
    return np.clip(value, 0.05, 0.95)


def render_linear(origin, rotation, intrinsics_inv, width, height,
                  sphere_radius=1.0, background=1.0):
    """Linear-intensity render of the sphere scene for one pose.

    Returns (img (H, W) float64 linear intensity, alpha (H, W) float64)."""
    xs, ys = np.meshgrid(np.arange(width), np.arange(height), indexing="xy")
    pix = np.stack([xs, ys, np.ones_like(xs)], axis=-1).astype(np.float64)
    cam_dirs = pix @ intrinsics_inv.T
    world_dirs = cam_dirs @ rotation.T
    world_dirs /= np.linalg.norm(world_dirs, axis=-1, keepdims=True)

    o_dot_d = world_dirs @ origin
    o_sq = float(origin @ origin)
    disc = o_dot_d**2 - (o_sq - sphere_radius**2)
    hit = disc > 0
    t_hit = -o_dot_d - np.sqrt(np.where(hit, disc, 0.0))
    hit &= t_hit > 0

    points = origin[None, None, :] + world_dirs * t_hit[..., None]
    normals = points / np.maximum(
        np.linalg.norm(points, axis=-1, keepdims=True), 1e-12
    )
    tex = sphere_texture(normals)
    img = np.where(hit, tex, background)
    return img, hit.astype(np.float64)


# ----------------------------------------------------------------------------
# trajectory
# ----------------------------------------------------------------------------

def orbit_pose(theta, radius=3.0, elevation=0.55, phi=None):
    """Camera position on an orbit, looking at the origin.

    `phi` (elevation angle, radians) gives a spherical parameterization
    covering a band of the viewing hemisphere; when None, the legacy
    wobbling-ring formula applies.  Returns (position (3,), rotation
    (3, 3)) in the common convention (x right, y down, z forward)."""
    if phi is not None:
        pos = np.array(
            [radius * np.cos(theta) * np.cos(phi),
             radius * np.sin(theta) * np.cos(phi),
             radius * np.sin(phi)],
            dtype=np.float64,
        )
    else:
        pos = np.array(
            [radius * np.cos(theta), radius * np.sin(theta),
             elevation * radius * np.sin(0.5 * theta + 0.3) * 0.4 + 0.8],
            dtype=np.float64,
        )
    forward = -pos / np.linalg.norm(pos)
    up_world = np.array([0.0, 0.0, 1.0])
    x_cam = np.cross(forward, up_world)
    x_cam /= np.linalg.norm(x_cam)
    y_cam = np.cross(forward, x_cam)  # points "down" for this convention
    rot = np.stack([x_cam, y_cam, forward], axis=1)  # columns
    return pos, rot


def orbit_theta(t, duration, revolutions=1.0, speed_wobble=0.0):
    """Angle as a function of time; `speed_wobble` in [0, 1) makes the
    angular speed non-uniform (the paper's non-uniform-motion setting)."""
    phase = t / duration
    return 2.0 * np.pi * revolutions * (
        phase + speed_wobble * np.sin(2.0 * np.pi * phase)
        / (2.0 * np.pi)
    )


# ----------------------------------------------------------------------------
# event simulation
# ----------------------------------------------------------------------------

def simulate_events(log_frames, frame_ts, pos_threshold, neg_threshold):
    """Per-pixel contrast-threshold crossing extraction.

    Args:
      log_frames: (K, P) log intensities at dense timestamps
      frame_ts: (K,) float64 seconds
    Returns (pixel_index (N,), timestamp_s (N,), polarity (N,) bool),
    time-sorted.
    """
    num_frames, num_pixels = log_frames.shape
    ref = log_frames[0].copy()
    all_pid, all_ts, all_pol = [], [], []

    for k in range(num_frames - 1):
        a = log_frames[k]
        b = log_frames[k + 1]
        t0, t1 = frame_ts[k], frame_ts[k + 1]
        db = b - a
        safe_db = np.where(np.abs(db) < 1e-12, 1.0, db)

        for polarity, threshold in ((True, pos_threshold),
                                    (False, neg_threshold)):
            if polarity:
                count = np.floor((b - ref) / threshold).astype(np.int64)
            else:
                count = np.floor((ref - b) / threshold).astype(np.int64)
            count = np.maximum(count, 0)
            total = int(count.sum())
            if total == 0:
                continue
            pid = np.repeat(np.arange(num_pixels), count)
            starts = np.repeat(np.cumsum(count) - count, count)
            j = np.arange(total) - starts + 1
            sign = 1.0 if polarity else -1.0
            level = ref[pid] + sign * j * threshold
            frac = (level - a[pid]) / safe_db[pid]
            ts = t0 + np.clip(frac, 0.0, 1.0) * (t1 - t0)
            all_pid.append(pid)
            all_ts.append(ts)
            all_pol.append(np.full(total, polarity))
            ref = ref + sign * count * threshold

    if not all_pid:
        return (np.zeros(0, np.int64), np.zeros(0, np.float64),
                np.zeros(0, bool))
    pid = np.concatenate(all_pid)
    ts = np.concatenate(all_ts)
    pol = np.concatenate(all_pol)
    order = np.argsort(ts, kind="stable")
    return pid[order], ts[order], pol[order]


# ----------------------------------------------------------------------------
# full dataset
# ----------------------------------------------------------------------------

def generate_dataset(
    out_dir,
    img_width=64,
    img_height=64,
    duration_s=4.0,
    num_pose_samples=81,
    num_sim_frames=401,
    num_train_views=8,
    num_val_views=4,
    num_test_views=4,
    contrast_threshold=0.2,
    p2n_ratio=1.0,
    fov_deg=60.0,
    speed_wobble=0.0,
    revolutions=1.0,
    elevation_sweep=0.0,  # radians; >0 sweeps a hemisphere band
    log_eps=1e-3,
    seed=0,
    sphere_radius=1.0,  # <1 leaves real empty space in the aabb — the
    #                     sparse-workload regime for the adaptive levers
):
    os.makedirs(out_dir, exist_ok=True)
    views_dir = os.path.join(out_dir, "views")
    os.makedirs(views_dir, exist_ok=True)

    focal = (img_width / 2) / np.tan(np.deg2rad(fov_deg) / 2)
    intrinsics = np.array(
        [[focal, 0, img_width / 2 - 0.5],
         [0, focal, img_height / 2 - 0.5],
         [0, 0, 1]],
        dtype=np.float64,
    )
    intrinsics_inv = np.linalg.inv(intrinsics)

    # ---- camera pose samples (the continuous trajectory's knots) ----
    from scipy.spatial.transform import Rotation

    def theta_of(t):
        return orbit_theta(t, duration_s, revolutions=revolutions,
                           speed_wobble=speed_wobble)

    def phi_of(theta):
        if elevation_sweep <= 0.0:
            return None
        return elevation_sweep * np.sin(1.7 * theta + 0.4)

    pose_ts = np.linspace(0.0, duration_s, num_pose_samples)
    positions, quats = [], []
    for t in pose_ts:
        theta = theta_of(t)
        pos, rot = orbit_pose(theta, phi=phi_of(theta))
        positions.append(pos)
        quats.append(Rotation.from_matrix(rot).as_quat())
    # hemisphere-align quaternions for clean interpolation
    quats = np.asarray(quats)
    for i in range(1, len(quats)):
        if np.dot(quats[i], quats[i - 1]) < 0:
            quats[i] = -quats[i]
    np.savez(
        os.path.join(out_dir, "camera_poses.npz"),
        T_wc_position=np.asarray(positions),
        T_wc_orientation=quats,
        T_wc_timestamp=(pose_ts * 1e9).round().astype(np.int64),
    )

    # ---- dense frame rendering & event simulation ----
    sim_ts = np.linspace(0.0, duration_s, num_sim_frames)
    log_frames = np.empty((num_sim_frames, img_height * img_width))
    for k, t in enumerate(sim_ts):
        theta = theta_of(t)
        pos, rot = orbit_pose(theta, phi=phi_of(theta))
        img, _ = render_linear(pos, rot, intrinsics_inv, img_width,
                               img_height, sphere_radius=sphere_radius)
        log_frames[k] = np.log(img + log_eps).reshape(-1)

    neg_threshold = contrast_threshold
    pos_threshold = p2n_ratio * neg_threshold
    pid, ts, pol = simulate_events(log_frames, sim_ts, pos_threshold,
                                   neg_threshold)
    xs = (pid % img_width).astype(np.uint16)
    ys = (pid // img_width).astype(np.uint16)
    # keep events strictly inside the pose time span
    # (preprocess_esim.py:224-227)
    keep = (ts > 0) & (ts < duration_s)
    np.savez(
        os.path.join(out_dir, "raw_events.npz"),
        position=np.stack([xs, ys], axis=1)[keep],
        timestamp=(ts[keep] * 1e9).round().astype(np.int64),
        polarity=pol[keep],
    )

    # ---- calibration & renderer params ----
    np.savez(
        os.path.join(out_dir, "camera_calibration.npz"),
        img_height=np.int64(img_height),
        img_width=np.int64(img_width),
        distortion_model="none",
        distortion_params=np.zeros(0),
        intrinsics=intrinsics,
        bayer_pattern="",
        pos_contrast_threshold=np.float64(pos_threshold),
        neg_contrast_threshold=np.float64(neg_threshold),
        refractory_period=np.int64(0),  # ns
    )
    np.savez(
        os.path.join(out_dir, "renderer_params.npz"),
        interm_color_space="display",
        log_eps=np.float64(log_eps),
    )

    # ---- evaluation views (display-space 8-bit BGRA PNGs, OpenGL poses) ----
    rng = np.random.default_rng(seed)

    def write_views(stage, thetas, elevations):
        frames = []
        for i, (theta, elev) in enumerate(zip(thetas, elevations)):
            if elevation_sweep > 0.0:
                pos, rot = orbit_pose(theta, phi=elev)
            else:
                pos, rot = orbit_pose(theta, elevation=elev)
            img, alpha = render_linear(pos, rot, intrinsics_inv,
                                       img_width, img_height,
                                       sphere_radius=sphere_radius)
            display = np.power(np.clip(img, 0.0, 1.0), 1.0 / GAMMA)
            display_u8 = np.clip(
                np.round(display * 255.0), 0, 255
            ).astype(np.uint8)
            alpha_u8 = (alpha * 255).astype(np.uint8)
            bgra = np.stack(
                [display_u8 * (alpha_u8 > 0)] * 3 + [alpha_u8], axis=-1
            )
            name = f"{stage}_{i:03d}"
            cv2.imwrite(os.path.join(views_dir, name + ".png"), bgra)
            rot_gl = rot @ np.diag([1.0, -1.0, -1.0])
            t_wc = np.eye(4)
            t_wc[:3, :3] = rot_gl
            t_wc[:3, 3] = pos
            frames.append(
                {"file_path": name, "transform_matrix": t_wc.tolist()}
            )
        with open(
            os.path.join(views_dir, f"transforms_{stage}.json"), "w"
        ) as f:
            json.dump(
                {"camera_angle_x": float(np.deg2rad(fov_deg)),
                 "frames": frames},
                f,
            )

    train_thetas = theta_of(
        np.linspace(0.05, 0.95, num_train_views) * duration_s
    )
    if elevation_sweep > 0.0:
        write_views("train", train_thetas,
                    [phi_of(t) for t in train_thetas])
        write_views(
            "val",
            rng.uniform(0, 2 * np.pi, num_val_views),
            rng.uniform(-0.9 * elevation_sweep, 0.9 * elevation_sweep,
                        num_val_views),
        )
        write_views(
            "test",
            rng.uniform(0, 2 * np.pi, num_test_views),
            rng.uniform(-0.9 * elevation_sweep, 0.9 * elevation_sweep,
                        num_test_views),
        )
    else:
        write_views("train", train_thetas, np.full(num_train_views, 0.55))
        write_views(
            "val",
            rng.uniform(0, 2 * np.pi, num_val_views),
            rng.uniform(0.35, 0.75, num_val_views),
        )
        write_views(
            "test",
            rng.uniform(0, 2 * np.pi, num_test_views),
            rng.uniform(0.35, 0.75, num_test_views),
        )
    return out_dir
