"""CLI/config system tests: tokenizer, options-file recursion, defaults."""
import pytest

from deepdish_tpu.pipeline.config import (expand_options_files,
                                          get_arguments, quoted_split)


def test_quoted_split():
    assert quoted_split('a b c') == ['a', 'b', 'c']
    assert quoted_split('--line "1,2, 3,4"') == ['--line', '1,2, 3,4']
    assert quoted_split("--x 'a b'") == ['--x', 'a b']


def test_options_file_expansion(tmp_path):
    inner = tmp_path / "inner.opts"
    inner.write_text("--max-age 30  # comment\n")
    outer = tmp_path / "outer.opts"
    outer.write_text(f"--wanted-labels person,car\n"
                     f"--options-file {inner}\n")
    argv = expand_options_files(
        ["--input", "x.mp4", "--options-file", str(outer)], str(tmp_path))
    assert argv == ["--input", "x.mp4", "--wanted-labels", "person,car",
                    "--max-age", "30"]


def test_options_file_cycle(tmp_path):
    a = tmp_path / "a.opts"
    b = tmp_path / "b.opts"
    a.write_text(f"--options-file {b}\n")
    b.write_text(f"--options-file {a}\n")
    with pytest.raises(ValueError, match="cycle"):
        expand_options_files(["--options-file", str(a)], str(tmp_path))


def test_reference_defaults():
    args = get_arguments(["--input", "x.mp4"])
    # deepdish.py:1412-1423,1470-1471 defaults
    assert args.max_cosine_distance == 0.2
    assert args.nms_max_overlap == 0.6
    assert args.max_iou_distance == 0.7
    assert args.max_age == 60
    assert args.wanted_labels == "person"
    assert args.encoder_batch_size == 32
    assert args.max_queue_size == 5
    assert args.heartbeat_delay_secs == 300
    assert args.control_port == 9090
    assert args.streaming_port == 8080
    assert args.object_annotation == "LABEL"
