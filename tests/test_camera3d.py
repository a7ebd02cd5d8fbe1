"""Pinhole ground-plane unprojection tests (3-D top-down mode)."""
import numpy as np

from deepdish_tpu.pipeline.camera3d import GroundCamera


def _cam(tilt, elev=2.0, roll=0.0):
    return GroundCamera(focallength_mm=4.0, sensor_wh_mm=(6.0, 4.5),
                        image_wh=(640, 480), elevation_m=elev,
                        tilt_deg=tilt, roll_deg=roll)


def test_straight_down_center():
    cam = _cam(tilt=0.0)
    p = cam.space_from_image([320.0, 240.0])
    np.testing.assert_allclose(p[:2], [0.0, 0.0], atol=1e-9)
    np.testing.assert_allclose(p[2], 0.0, atol=1e-9)


def test_tilt_45_center_distance():
    cam = _cam(tilt=45.0, elev=3.0)
    p = cam.space_from_image([320.0, 240.0])
    # view ray at 45 deg hits the ground at horizontal distance = elevation
    np.testing.assert_allclose(p[1], 3.0, rtol=1e-6)
    np.testing.assert_allclose(p[0], 0.0, atol=1e-9)


def test_above_horizon_is_inf():
    cam = _cam(tilt=90.0, elev=2.0)  # looking at the horizon
    p = cam.space_from_image([320.0, 0.0])  # top of image = above horizon
    assert not np.isfinite(p[:2]).all()


def test_lower_pixels_are_closer():
    cam = _cam(tilt=60.0, elev=4.0)
    near = cam.space_from_image([320.0, 470.0])
    far = cam.space_from_image([320.0, 250.0])
    assert near[1] < far[1]


def test_batch_shape():
    cam = _cam(tilt=30.0)
    pts = cam.space_from_image(np.array([[10.0, 20.0], [300.0, 400.0]]))
    assert pts.shape == (2, 3)
