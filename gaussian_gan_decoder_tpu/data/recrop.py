"""360-degree head recropping geometry (3DDFA alignment pipeline).

Re-design of the pose-alignment math of
/root/reference/PanoHead/3DDFA_V2_cropping/recrop_images.py:26-330 — the
part of the reference's dataset pipeline that turns (image, landmarks,
3DMM pose) into the canonically-cropped 512^2 image + 25-dim EG3D camera
label that PanoHead trains on. The face DETECTOR itself (FaceBoxes +
TDDFA nets) needs external weights that cannot ship here; everything
around it is pure geometry and lives in this module:

  * landmark quad estimation (FFHQ-style and eye/nose methods);
  * scaled-orthographic pose decomposition (P2sRt, matrix2angle);
  * the pose-driven quad refinement + acceptance gates;
  * the feathered affine crop (crop_final);
  * world2cam -> EG3D 25-dim label conversion (eg3d_cam_params).

A detector callback (image -> (P_3x4, roi_box) per face) plugs into
apps/recrop_images.py for users who have 3DDFA weights.
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import numpy as np

EG3D_CAMERA_DIST = 2.7
EG3D_FOCAL = 4.2647


def eg3d_cam_params(world2cam: np.ndarray) -> np.ndarray:
    """4x4 world2cam rotation (OpenGL-ish, pre-translation) -> 25-dim EG3D
    label [cam2world 16 | intrinsics 9] (ref recrop_images.py:26-49):
    push the camera back by EG3D's canonical 2.7 radius, flip y/z into the
    OpenCV convention, invert, append the canonical intrinsics."""
    R = np.asarray(world2cam, np.float32).reshape(4, 4)
    t = np.eye(4, dtype=np.float32)
    t[2, 3] = -EG3D_CAMERA_DIST
    convert = np.diag([1.0, -1.0, -1.0, 1.0]).astype(np.float32)
    cam2world = np.linalg.inv(convert @ t @ R)
    intr = np.array([[EG3D_FOCAL, 0, 0.5], [0, EG3D_FOCAL, 0.5], [0, 0, 1]],
                    np.float32)
    return np.concatenate([cam2world.reshape(16), intr.reshape(9)], 0)


def p2srt(P: np.ndarray) -> Tuple[float, np.ndarray, np.ndarray]:
    """Scaled-orthographic 3x4 camera matrix -> (scale, R 3x3, t3d).

    Standard 3DMM decomposition (the reference calls TDDFA's P2sRt):
    s = mean row norm of the first two rows; R = orthonormalized rows
    (r1, r2, r1 x r2)."""
    P = np.asarray(P, np.float64).reshape(3, 4)
    t3d = P[:, 3].copy()
    r1 = P[0, :3]
    r2 = P[1, :3]
    s = (np.linalg.norm(r1) + np.linalg.norm(r2)) / 2.0
    r1n = r1 / np.linalg.norm(r1)
    r2n = r2 / np.linalg.norm(r2)
    r3n = np.cross(r1n, r2n)
    R = np.stack([r1n, r2n, r3n], axis=0)
    return float(s), R.astype(np.float32), t3d.astype(np.float32)


def matrix2angle(R: np.ndarray) -> Tuple[float, float, float]:
    """Rotation matrix -> (yaw, pitch, roll) radians, 3DDFA convention
    (x = yaw about vertical, y = pitch, z = roll)."""
    R = np.asarray(R, np.float64)
    if R[2, 0] > 0.998:
        yaw = -math.pi / 2
        pitch = 0.0
        roll = math.atan2(-R[0, 1], -R[0, 2])
    elif R[2, 0] < -0.998:
        yaw = math.pi / 2
        pitch = 0.0
        roll = math.atan2(R[0, 1], R[0, 2])
    else:
        yaw = math.asin(-R[2, 0])
        pitch = math.atan2(R[2, 1], R[2, 2])
        roll = math.atan2(R[1, 0], R[0, 0])
    return yaw, pitch, roll


def angle2matrix(yaw: float, pitch: float, roll: float) -> np.ndarray:
    """Inverse of matrix2angle (tests + synthetic labels)."""
    Rx = np.array([[1, 0, 0],
                   [0, math.cos(pitch), -math.sin(pitch)],
                   [0, math.sin(pitch), math.cos(pitch)]])
    Ry = np.array([[math.cos(yaw), 0, math.sin(yaw)],
                   [0, 1, 0],
                   [-math.sin(yaw), 0, math.cos(yaw)]])
    Rz = np.array([[math.cos(roll), -math.sin(roll), 0],
                   [math.sin(roll), math.cos(roll), 0],
                   [0, 0, 1]])
    return (Rz @ Ry @ Rx).astype(np.float32)


def crop_bound_from_landmarks(
    lm: np.ndarray, method: str = "ffhq"
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Landmarks (68 or 106 points) -> (quad (4,2), center, x-axis, y-axis)
    (ref get_crop_bound, recrop_images.py:51-92). The FFHQ method is the
    StyleGAN alignment recipe; 'default' scales by eye/nose distances."""
    lm = np.asarray(lm, np.float64)
    if len(lm) == 106:
        left_e, right_e = lm[104], lm[105]
        nose = lm[49]
        left_m, right_m = lm[84], lm[90]
        center = (lm[1] + lm[31]) * 0.5
    elif len(lm) == 68:
        left_e = lm[36:42].mean(axis=0)
        right_e = lm[42:48].mean(axis=0)
        nose = lm[33]
        left_m, right_m = lm[48], lm[54]
        center = (lm[0] + lm[16]) * 0.5
    else:
        raise ValueError(f"unsupported landmark count {len(lm)}")

    eye_to_eye = right_e - left_e
    eye_avg = (left_e + right_e) * 0.5
    if method == "ffhq":
        mouth_avg = (left_m + right_m) * 0.5
        eye_to_mouth = mouth_avg - eye_avg
        x = eye_to_eye - np.flipud(eye_to_mouth) * [-1, 1]
        x /= np.hypot(*x)
        x *= max(np.hypot(*eye_to_eye) * 2.0, np.hypot(*eye_to_mouth) * 1.8)
        c = eye_avg + eye_to_mouth * 0.1
    elif method == "default":
        eye_to_nose = nose - eye_avg
        x = eye_to_eye.copy()
        x /= np.hypot(*x)
        x *= max(np.hypot(*eye_to_eye) * 2.4, np.hypot(*eye_to_nose) * 2.75)
        c = center
    else:
        raise ValueError(f"unknown crop method {method}")
    y = np.flipud(x) * [-1, 1]
    quad = np.stack([c - x - y, c - x + y, c + x + y, c + x - y])
    return quad.astype(np.float32), c, x, y


def find_center_bbox(roi_boxes: Sequence[Sequence[float]], w: int, h: int) -> int:
    """Index of the detection closest to the image center
    (ref recrop_images.py:162-167)."""
    b = np.asarray(roi_boxes, np.float64)
    dx = 0.5 * (b[:, 0] + b[:, 2]) - 0.5 * (w - 1)
    dy = 0.5 * (b[:, 1] + b[:, 3]) - 0.5 * (h - 1)
    return int(np.argmin(np.hypot(dx, dy)))


class PoseRefineResult:
    """Output of refine_quad_with_pose."""

    def __init__(self, quad, cam_label, pose_deg, s, t3d, reject_reason):
        self.quad = quad
        self.cam_label = cam_label
        self.pose_deg = pose_deg
        self.s = s
        self.t3d = t3d
        self.reject_reason = reject_reason

    @property
    def accepted(self) -> bool:
        return self.reject_reason is None


def refine_quad_with_pose(
    quad_c: np.ndarray, quad_x: np.ndarray, quad_y: np.ndarray,
    P: np.ndarray,                     # (3, 4) scaled-orthographic 3DMM cam
    roi_box: Sequence[float],          # detector roi in crop coords
    crop_size: int,                    # the working crop resolution (512)
    tddfa_size: int = 120,             # 3DMM input resolution
    u_mean_z: float = 66.67,           # BFM mean-shape z centroid (the
    # reference reads tddfa.bfm.u; 3DDFA's 120-size BFM centroid ~66.67)
) -> PoseRefineResult:
    """The reference's pose-driven quad refinement + acceptance gates
    (recrop_images.py:169-275): normalize the 3DMM translation back to
    the working crop, recenter/rescale the quad by it, gate on scale,
    pose and translation, and emit the EG3D camera label."""
    s_rel, R, t3d = p2srt(P)
    yaw, pitch, roll = matrix2angle(R)
    pose_deg = [a * 180.0 / math.pi for a in (yaw, pitch, roll)]

    # recenter the 3DMM object along its own z (ref :225-230)
    trans_z = np.array([0.0, 0.0, 0.5 * u_mean_z])
    t3d = t3d + (R[:, :3] @ trans_z.reshape(3, 1)).reshape(3)

    w = h = crop_size
    sx, sy, ex, ey = roi_box
    scale_x = (ex - sx) / tddfa_size
    scale_y = (ey - sy) / tddfa_size
    t3d = t3d.astype(np.float64)
    t3d[0] = (t3d[0] - 1) * scale_x + sx
    t3d[1] = (tddfa_size - t3d[1]) * scale_y + sy
    t3d[0] = (t3d[0] - 0.5 * (w - 1)) / (0.5 * (w - 1))
    t3d[1] = -((t3d[1] - 0.5 * (h - 1)) / (0.5 * (h - 1)))
    t3d[2] = 0.0

    s_abs = s_rel * 2000.0
    s = ((ex - sx) / (w - 1) + (ey - sy) / (h - 1)) / 2 * s_abs

    reject = None
    if not (0.7 <= s <= 1.3):
        reject = f"scale {s:.3f} outside [0.7, 1.3]"
    elif abs(pose_deg[0]) > 90 or abs(pose_deg[1]) > 80 or abs(pose_deg[2]) > 50:
        reject = f"pose {pose_deg} outside gates"
    elif abs(t3d[0]) > 1.0 or abs(t3d[1]) > 1.0:
        reject = f"translation {t3d[:2]} outside [-1, 1]"

    quad_c = quad_c + quad_x * t3d[0] - quad_y * t3d[1]
    quad_x = quad_x * s
    quad_y = quad_y * s
    c, x, y = quad_c, quad_x, quad_y
    quad = np.stack([c - x - y, c - x + y, c + x + y, c + x - y]).astype(np.float32)

    # final label: rotation only, zero translation (ref :281-287)
    P44 = np.eye(4, dtype=np.float32)
    P44[:3, :3] = R
    cam_label = eg3d_cam_params(P44)
    return PoseRefineResult(quad, cam_label, pose_deg, s, t3d, reject)


def crop_quad(img: np.ndarray, quad: np.ndarray, size: int,
              border_reflect: bool = False) -> np.ndarray:
    """Affine-warp the quad to a size x size crop (ref crop_image)."""
    import cv2

    bound = np.array([[0, 0], [0, size - 1], [size - 1, size - 1]],
                     np.float32)
    mat = cv2.getAffineTransform(np.asarray(quad[:3], np.float32), bound)
    mode = cv2.BORDER_REFLECT if border_reflect else cv2.BORDER_CONSTANT
    return cv2.warpAffine(np.asarray(img), mat, (size, size),
                          flags=cv2.INTER_LANCZOS4, borderMode=mode)


def crop_final(
    img: np.ndarray, quad: np.ndarray, size: int = 512,
    top_expand: float = 0.1, left_expand: float = 0.05,
    bottom_expand: float = 0.0, right_expand: float = 0.05,
    min_size: Optional[int] = 256, upsample: int = 2,
) -> Optional[np.ndarray]:
    """The reference's final crop (recrop_images.py:105-160): expand the
    quad asymmetrically (PanoHead wants extra headroom at the top),
    Lanczos-warp at `upsample` resolution, and feather reflected border
    pixels into a blurred background so out-of-frame regions don't ring."""
    import cv2

    img = np.asarray(img)
    orig_size = min(np.linalg.norm(quad[1] - quad[0]),
                    np.linalg.norm(quad[2] - quad[1]))
    if min_size is not None and orig_size < min_size:
        return None

    crop_w = int(size * (1 + left_expand + right_expand))
    crop_h = int(size * (1 + top_expand + bottom_expand))
    top = int(size * top_expand)
    left = int(size * left_expand)
    s1 = size - 1
    bound = np.array([[left, top], [left, top + s1], [left + s1, top + s1]],
                     np.float32)
    mat = cv2.getAffineTransform(np.asarray(quad[:3], np.float32), bound)
    if upsample and upsample > 1:
        big = (crop_w * upsample, crop_h * upsample)
        crop_img = cv2.warpAffine(img, upsample * mat, big,
                                  flags=cv2.INTER_LANCZOS4,
                                  borderMode=cv2.BORDER_REFLECT)
        crop_img = cv2.resize(crop_img, (crop_w, crop_h),
                              interpolation=cv2.INTER_AREA)
    else:
        crop_img = cv2.warpAffine(img, mat, (crop_w, crop_h),
                                  flags=cv2.INTER_LANCZOS4,
                                  borderMode=cv2.BORDER_REFLECT)

    # feather: where the warp read outside the source, blend toward blur
    empty = np.full_like(img, 255)
    crop_mask = cv2.warpAffine(empty, mat, (crop_w, crop_h))
    if crop_mask.mean() < 255:
        mask_kernel = int(size * 0.02) * 2 + 1
        blur_kernel = int(size * 0.03) * 2 + 1
        blur_mask = cv2.blur(
            crop_mask.astype(np.float32).mean(2), (mask_kernel, mask_kernel)
        )[..., None] / 255.0
        blurred = cv2.blur(crop_img, (blur_kernel, blur_kernel), 0)
        crop_img = (crop_img * blur_mask + blurred * (1 - blur_mask)).astype(np.uint8)
    return crop_img
