"""Dict-backed NuScenes devkit stand-in (SURVEY.md section 4: recorded-obs
fixture), so the host-side token walking / sweep merging / box labelling
path (dataloaders/nuscenes.py + nuscenes_utils.py) is testable without the
devkit, pyquaternion, or the dataset.

Builds a 3-keyframe scene with `sweeps_between` intermediate lidar sweeps
per keyframe, 6 cameras, one PARKED car and one MOVING car (GT boxes with
annotations), lidar .bin files and camera .png files on disk under a temp
dataroot — the exact surfaces NuScenesDataloader touches.
"""
from __future__ import annotations

import os

import numpy as np

# Lidar mounted 1 m up, identity rotation; cameras look +x/-x/+y/-y.
LIDAR_T = [0.0, 0.0, 1.8]
EGO_Z = 0.0
IMG_W, IMG_H = 160, 96
_QID = [1.0, 0.0, 0.0, 0.0]  # identity wxyz


def _yaw_quat(yaw):
    return [float(np.cos(yaw / 2)), 0.0, 0.0, float(np.sin(yaw / 2))]


class FakeBox:
    """Mimics nuscenes.utils.data_classes.Box for the fields the pipeline
    reads: name, token (annotation token), center, orientation, wlh."""

    def __init__(self, name, anno_token, center, yaw, wlh):
        self.name = name
        self.token = anno_token
        self.center = np.asarray(center, float)
        self.orientation = _yaw_quat(yaw)   # plain wxyz (tf() handles it)
        self.wlh = np.asarray(wlh, float)


class FakeNuScenes:
    """get()/get_boxes()/get_sample_data_path()/box_velocity()/scene over
    in-memory tables + files under ``dataroot``."""

    def __init__(self, dataroot, n_keyframes=3, sweeps_between=2,
                 step=2.0, seed=0, n_world_points=1500):
        self.dataroot = dataroot
        self.scene = []
        self._tables = {k: {} for k in
                        ('sample', 'sample_data', 'calibrated_sensor',
                         'ego_pose', 'sample_annotation', 'log')}
        self._boxes_by_sd = {}
        self._velocity = {}
        rng = np.random.default_rng(seed)

        # Static world: road plane + two wall strips.
        n = n_world_points
        world = np.zeros((n, 3))
        world[:, 0] = rng.uniform(-10, 40, n)
        world[:, 1] = rng.uniform(-8, 8, n)
        world[:, 2] = np.where(np.abs(world[:, 1]) > 6,
                               rng.uniform(0, 4, n), 0.05)
        self._world = world
        self._world_int = rng.uniform(0, 0.9, n).astype(np.float32)

        # Two GT instances: parked + moving car (1.5 m/frame => dynamic).
        self.parked_center0 = np.array([12.0, -3.0, 0.8])
        self.moving_center0 = np.array([6.0, 2.5, 0.8])
        self.moving_vel = np.array([1.5, 0.0, 0.0])     # per keyframe step
        self.car_wlh = np.array([1.9, 4.6, 1.6])        # w, l, h
        car_pts = np.stack([rng.uniform(-1.8, 1.8, 60),
                            rng.uniform(-0.7, 0.7, 60),
                            rng.uniform(-0.6, 0.7, 60)], 1)
        self._car_template = car_pts

        # Calibrated sensors: lidar + 6 cameras on yaw spokes.
        self._put('calibrated_sensor', 'cs_lidar', {
            'translation': LIDAR_T, 'rotation': _QID,
            'camera_intrinsic': []})
        cam_yaws = np.linspace(0, 2 * np.pi, 6, endpoint=False)
        K = [[110.0, 0.0, IMG_W / 2], [0.0, 110.0, IMG_H / 2],
             [0.0, 0.0, 1.0]]
        for c, yaw in enumerate(cam_yaws):
            # Camera frame: +z optical axis along the yaw spoke, +x right,
            # +y down -> R_ego_cam columns are [right, down, forward].
            fwd = np.array([np.cos(yaw), np.sin(yaw), 0.0])
            right = np.array([np.sin(yaw), -np.cos(yaw), 0.0])
            down = np.array([0.0, 0.0, -1.0])
            R = np.stack([right, down, fwd], axis=1)
            self._put('calibrated_sensor', f'cs_cam{c}', {
                'translation': [0.0, 0.0, 1.6],
                'rotation': _mat_to_wxyz(R),
                'camera_intrinsic': K})

        os.makedirs(os.path.join(dataroot, 'sweeps'), exist_ok=True)
        os.makedirs(os.path.join(dataroot, 'cams'), exist_ok=True)

        # Build the sample_data chains (lidar: keyframes + intermediate
        # sweeps sharing one `prev` chain) and the keyframe samples.
        sample_tokens = [f'sample{k}' for k in range(n_keyframes)]
        # Scene attribute surface for the runner's skip-filter
        # (runners/nuscenes_bev_gen.scene_attributes).
        self._put('log', 'log0', {'location': 'fake-location'})
        self.scene.append({'name': 'fake-scene-0',
                           'token': 'scene0',
                           'description': 'Fake scene, sunny, daytime',
                           'log_token': 'log0',
                           'first_sample_token': sample_tokens[0]})
        lidar_chain = []   # (sd_token, t_seconds, ego_x, is_key, sample)
        dt = 1.0 / (sweeps_between + 1)
        for k in range(n_keyframes):
            for j in range(sweeps_between + 1):
                if k == 0 and j < sweeps_between:
                    continue  # no sweeps before the first keyframe
                is_key = (j == sweeps_between)
                t = k + (j - sweeps_between) * dt
                ego_x = step * t
                tok = f'sd_lidar_{k}_{j}'
                lidar_chain.append(
                    (tok, t, ego_x, is_key, sample_tokens[k] if is_key
                     else ''))
        prev = ''
        for tok, t, ego_x, is_key, sample_tok in lidar_chain:
            pose_tok = f'pose_{tok}'
            self._put('ego_pose', pose_tok, {
                'translation': [ego_x, 0.0, EGO_Z], 'rotation': _QID})
            fname = os.path.join('sweeps', tok + '.bin')
            self._write_lidar_bin(os.path.join(dataroot, fname), t, ego_x)
            self._put('sample_data', tok, {
                'token': tok, 'channel': 'LIDAR_TOP',
                'calibrated_sensor_token': 'cs_lidar',
                'ego_pose_token': pose_tok,
                'timestamp': int(t * 1e6) + 10**15,
                'filename': fname, 'prev': prev, 'next': '',
                'is_key_frame': is_key, 'sample_token': sample_tok})
            if prev:
                self._tables['sample_data'][prev]['next'] = tok
            prev = tok
            self._boxes_by_sd[tok] = self._make_boxes(tok, t)

        # Camera sample_data (keyframes only) + samples.
        for k, stok in enumerate(sample_tokens):
            data = {'LIDAR_TOP': f'sd_lidar_{k}_{sweeps_between}'}
            for c in range(6):
                ctok = f'sd_cam{c}_{k}'
                pose_tok = f'pose_{ctok}'
                self._put('ego_pose', pose_tok, {
                    'translation': [step * k, 0.0, EGO_Z],
                    'rotation': _QID})
                fname = os.path.join('cams', ctok + '.png')
                self._write_cam_png(os.path.join(dataroot, fname), c, k)
                self._put('sample_data', ctok, {
                    'token': ctok, 'channel': f'CAM{c}',
                    'calibrated_sensor_token': f'cs_cam{c}',
                    'ego_pose_token': pose_tok,
                    'timestamp': int(k * 1e6) + 10**15,
                    'filename': fname, 'prev': '', 'next': '',
                    'width': IMG_W, 'height': IMG_H,
                    'is_key_frame': True, 'sample_token': stok})
                data[f'CAM{c}'] = ctok   # channel names fed to the loader
            # Standard channel names too, for NuScenesDataloader defaults.
            for name, c in zip(('CAM_FRONT', 'CAM_FRONT_LEFT',
                                'CAM_FRONT_RIGHT', 'CAM_BACK',
                                'CAM_BACK_LEFT', 'CAM_BACK_RIGHT'),
                               range(6)):
                data[name] = data[f'CAM{c}']
            self._put('sample', stok, {
                'token': stok, 'scene_token': 'scene0', 'data': data,
                'next': sample_tokens[k + 1] if k + 1 < n_keyframes else '',
                'prev': sample_tokens[k - 1] if k > 0 else ''})

    # ------------------------------------------------------------------
    def _make_boxes(self, sd_token, t):
        """GT boxes in the GLOBAL frame at time t + their annotations."""
        boxes = []
        for name, center0, vel in (
                ('vehicle.car', self.parked_center0, np.zeros(3)),
                ('vehicle.car', self.moving_center0, self.moving_vel)):
            inst = 'inst_parked' if vel[0] == 0 else 'inst_moving'
            anno_tok = f'anno_{inst}_{sd_token}'
            center = center0 + vel * t
            boxes.append(FakeBox(name, anno_tok, center, 0.0, self.car_wlh))
            self._put('sample_annotation', anno_tok, {
                'token': anno_tok, 'instance_token': inst,
                'num_lidar_pts': 10})
            self._velocity[anno_tok] = vel / 2.0   # [m/s] (step=2 m / 1 s)
        # An ignored-class box and a zero-lidar-pts box: must be skipped.
        boxes.append(FakeBox('movable_object.barrier', f'anno_bar_{sd_token}',
                             [5.0, -5.0, 0.5], 0.0, [0.5, 2.0, 1.0]))
        self._put('sample_annotation', f'anno_bar_{sd_token}', {
            'token': f'anno_bar_{sd_token}', 'instance_token': 'inst_bar',
            'num_lidar_pts': 10})
        boxes.append(FakeBox('vehicle.car', f'anno_empty_{sd_token}',
                             [30.0, 6.0, 0.8], 0.0, self.car_wlh))
        self._put('sample_annotation', f'anno_empty_{sd_token}', {
            'token': f'anno_empty_{sd_token}', 'instance_token': 'inst_far',
            'num_lidar_pts': 0})
        return boxes

    def _points_world(self, t):
        """World-frame points at time t: static world + both cars."""
        moving = self._car_template * [1.0, 0.35, 0.4] \
            + self.moving_center0 + self.moving_vel * t
        parked = self._car_template * [1.0, 0.35, 0.4] + self.parked_center0
        pts = np.concatenate([self._world, parked, moving])
        inten = np.concatenate([
            self._world_int,
            np.full(parked.shape[0], 0.5, np.float32),
            np.full(moving.shape[0], 0.7, np.float32)])
        return pts, inten

    def _write_lidar_bin(self, path, t, ego_x):
        """Devkit .bin layout: float32 (N, 5) [x y z intensity ring], in
        the LIDAR frame. Includes a couple of ego-hull points (r < 2 m)
        that the center_radius filter must remove."""
        pts_w, inten = self._points_world(t)
        lidar_origin = np.array([ego_x, 0.0, EGO_Z]) + LIDAR_T
        local = pts_w - lidar_origin
        keep = np.linalg.norm(local[:, :2], axis=1) < 25.0
        local, inten = local[keep], inten[keep]
        hull = np.array([[0.5, 0.2, -1.0], [-0.4, -0.3, -0.9],
                         [1.0, 0.9, -1.2]])
        local = np.concatenate([local, hull])
        inten = np.concatenate([inten, [0.9, 0.9, 0.9]])
        rows = np.zeros((local.shape[0], 5), np.float32)
        rows[:, :3] = local
        rows[:, 3] = inten
        rows.tofile(path)

    def _write_cam_png(self, path, cam_idx, k):
        from PIL import Image
        img = np.zeros((IMG_H, IMG_W, 3), np.uint8)
        img[..., 0] = (37 * cam_idx + k) % 256
        img[..., 1] = np.linspace(0, 255, IMG_H, dtype=np.uint8)[:, None]
        img[..., 2] = np.linspace(0, 255, IMG_W, dtype=np.uint8)[None, :]
        Image.fromarray(img).save(path)

    # ------------------------------------------------------------------
    # Devkit API surface
    # ------------------------------------------------------------------
    def _put(self, table, token, record):
        record = dict(record)
        record.setdefault('token', token)
        self._tables[table][token] = record

    def get(self, table, token):
        return self._tables[table][token]

    def get_sample_data_path(self, sd_token):
        return os.path.join(self.dataroot,
                            self._tables['sample_data'][sd_token]['filename'])

    def get_boxes(self, sd_token):
        return list(self._boxes_by_sd[sd_token])

    def box_velocity(self, anno_token):
        return self._velocity.get(anno_token, np.zeros(3)).copy()


def _mat_to_wxyz(R):
    """Rotation matrix -> wxyz quaternion (w >= 0)."""
    w = np.sqrt(max(0.0, 1.0 + R[0, 0] + R[1, 1] + R[2, 2])) / 2.0
    if w > 1e-6:
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
    else:  # w ~ 0: 180-degree rotation; pick the dominant axis column
        x = np.sqrt(max(0.0, 1 + R[0, 0] - R[1, 1] - R[2, 2])) / 2.0
        if x > 1e-6:
            y = (R[0, 1] + R[1, 0]) / (4 * x)
            z = (R[0, 2] + R[2, 0]) / (4 * x)
        else:
            y = np.sqrt(max(0.0, 1 - R[0, 0] + R[1, 1] - R[2, 2])) / 2.0
            z = (R[1, 2] + R[2, 1]) / (4 * max(y, 1e-12))
        w = (R[2, 1] - R[1, 2]) / (4 * max(x, 1e-12)) if x > 1e-6 else 0.0
    return [float(w), float(x), float(y), float(z)]
