"""End-to-end multi-stream CLI test (native loader + sharded engine)."""
import numpy as np
import pytest

from deepdish_tpu.tools.multistream_demo import main as ms_main
from test_pipeline_e2e import make_video


@pytest.mark.timeout(600)
def test_multistream_demo(tmp_path):
    paths = []
    for i in range(3):
        p = tmp_path / f"v{i}.mp4"
        make_video(p)
        paths.append(str(p))
    result = ms_main([
        "--inputs", *paths,
        "--model", "ssd_mobilenet", "--encoder-model", "dummy",
        "--width", "192", "--height", "96", "--max-frames", "4",
        "--device", "cpu",
    ])
    assert result["streams"] == 3
    assert result["frames"] >= 12
    assert len(result["per_stream"]) == 3
    for c in result["per_stream"]:
        assert "poscount_person" in c
