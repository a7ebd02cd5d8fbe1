"""Native C++ multi-stream frame loader tests."""
import numpy as np
import pytest

from deepdish_tpu.utils.native import NativeFrameLoader, load_library
from test_pipeline_e2e import make_video, FRAMES, W, H


@pytest.fixture(scope="module")
def videos(tmp_path_factory):
    d = tmp_path_factory.mktemp("vids")
    paths = []
    for i in range(3):
        p = d / f"v{i}.mp4"
        make_video(p)
        paths.append(str(p))
    return paths


def test_library_builds():
    assert load_library() is not None


def test_multi_stream_chunks(videos):
    with NativeFrameLoader(videos, W, H) as fl:
        frames, counts, total = fl.next_chunk(8)
        assert frames.shape == (3, 8, H, W, 3)
        assert (counts == 8).all()
        assert total == 24
        # frames contain the synthetic rectangles (nonzero content)
        assert frames.max() > 200
        # streams decode the same video -> identical frames
        np.testing.assert_array_equal(frames[0], frames[1])

        # drain to the end; counts drop below chunk on the last one
        seen = 8
        while True:
            frames, counts, total = fl.next_chunk(8)
            if total == 0:
                break
            seen += counts[0]
        assert seen == FRAMES


def test_resize_path(videos):
    with NativeFrameLoader(videos[:1], W // 2, H // 2) as fl:
        frames, counts, total = fl.next_chunk(2)
        assert frames.shape == (1, 2, H // 2, W // 2, 3)
        assert total == 2


def test_yuv_mode(videos):
    import cv2
    from deepdish_tpu.ops.colorspace import yuv420_to_rgb
    import jax.numpy as jnp
    with NativeFrameLoader(videos[:1], W, H, yuv420=True) as fl:
        frames, counts, total = fl.next_chunk(2)
        assert frames.shape == (1, 2, H * 3 // 2, W)
        assert total == 2
        rgb = np.asarray(yuv420_to_rgb(jnp.asarray(frames[0, 0]), H, W))
        # same frame decoded in RGB mode
    with NativeFrameLoader(videos[:1], W, H) as fl:
        rgb_frames, _, _ = fl.next_chunk(1)
    err = np.abs(rgb - rgb_frames[0, 0].astype(np.float32))
    assert np.median(err) <= 2.0
