import os
import textwrap

from pixelnerf_tpu.utils import hocon


def test_basic_types(tmp_path):
    text = textwrap.dedent(
        """
        # comment
        model {
            use_encoder = True
            n = 5  # trailing comment
            f = 1.5
            name = resnet34
            quoted = "hello world"
        }
        renderer {
            sched = []
            lst = [1, 2, 3]
            white_bkgd = True
        }
        top = 7
        """
    )
    conf = hocon.loads(text)
    assert conf.get_bool("model.use_encoder") is True
    assert conf.get_int("model.n") == 5
    assert conf.get_float("model.f") == 1.5
    assert conf.get_string("model.name") == "resnet34"
    assert conf.get_string("model.quoted") == "hello world"
    assert conf.get_list("renderer.sched") == []
    assert conf.get_list("renderer.lst") == [1, 2, 3]
    assert conf.get_int("top") == 7
    assert conf.get_int("missing.key", 42) == 42


def test_nested_inline_and_subtree():
    conf = hocon.loads("a { b { c = 1 } }\nd = 2")
    assert conf.get_int("a.b.c") == 1
    sub = conf["a"]
    assert sub.get_int("b.c") == 1
    assert conf.get_int("d") == 2


def test_include_and_merge(tmp_path):
    base = tmp_path / "base.conf"
    base.write_text("model { x = 1\n y = 2 }\nrenderer { n_coarse = 64 }")
    child = tmp_path / "child.conf"
    child.write_text('include required("base.conf")\nmodel { y = 3\n z = 4 }')
    conf = hocon.load(str(child))
    assert conf.get_int("model.x") == 1
    assert conf.get_int("model.y") == 3  # override
    assert conf.get_int("model.z") == 4
    assert conf.get_int("renderer.n_coarse") == 64


def test_multiline_list():
    conf = hocon.loads("sched = [[10, 20],\n [64, 32],\n [16, 8]]")
    assert conf.get_list("sched") == [[10, 20], [64, 32], [16, 8]]


def test_repo_conf_tree_parses():
    root = os.path.join(os.path.dirname(__file__), "..", "conf")
    for dirpath, _, files in os.walk(root):
        for f in files:
            if f.endswith(".conf"):
                conf = hocon.load(os.path.join(dirpath, f))
                assert isinstance(conf, hocon.ConfigTree)
