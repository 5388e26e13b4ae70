"""Config-engine tests: parsing, precedence, references, query_parameter."""

import pytest

from nerf_downstream_tpu import config as cfg


@pytest.fixture(autouse=True)
def _clean():
    cfg.clear_config()
    yield
    cfg.clear_config()


def test_binding_injected_and_explicit_wins():
    @cfg.configurable
    def f(a=1, b=2):
        return a, b

    cfg.parse_config("f.a = 10\nf.b = 20\n")
    assert f() == (10, 20)
    assert f(b=5) == (10, 5)
    assert f(3) == (3, 20)


def test_last_wins_precedence():
    @cfg.configurable
    def g(x=0):
        return x

    cfg.parse_config("g.x = 1")
    cfg.parse_config("g.x = 2")
    assert g() == 2


def test_multiline_list_and_comments():
    @cfg.configurable
    def h(transforms=()):
        return transforms

    cfg.parse_config(
        """
# leading comment
h.transforms = [
    "RandomRotation",
    "RandomAffine", # affine to rotate the rectangular crop
    "ElasticDistortion",
]
"""
    )
    assert h() == ["RandomRotation", "RandomAffine", "ElasticDistortion"]


def test_tuple_of_tuples_value():
    @cfg.configurable
    def e(distortion_params=None):
        return distortion_params

    cfg.parse_config("e.distortion_params = [(4, 16)]")
    assert e() == [(4, 16)]


def test_none_and_negative_values():
    @cfg.configurable
    def d(void_label=0, ignore_label=0):
        return void_label, ignore_label

    cfg.parse_config("d.void_label = None\nd.ignore_label = -255")
    assert d() == (None, -255)


def test_query_parameter():
    cfg.parse_config("train.max_steps = 60000\ntrain.lr = 1e-1")
    assert cfg.query_parameter("train.max_steps") == 60000
    assert cfg.query_parameter("train.lr") == 0.1
    assert cfg.query_parameter("train.nope", default=None) is None
    with pytest.raises(cfg.ConfigError):
        cfg.query_parameter("train.nope")


def test_reference_value():
    @cfg.configurable
    def target():
        return 42

    @cfg.configurable
    def user(fn=None):
        return fn

    cfg.parse_config("user.fn = @target")
    assert user()() == 42
    cfg.parse_config("user.fn = @target()")
    assert user() == 42


def test_macro():
    @cfg.configurable
    def m(v=0):
        return v

    cfg.parse_config("LR = 0.5\nm.v = %LR")
    assert m() == 0.5


def test_parse_reference_config_files():
    """All reference .gin files must parse without error."""
    import glob

    files = glob.glob("/root/reference/**/*.gin", recursive=True)
    assert len(files) > 100
    for path in files:
        cfg.clear_config()
        cfg.parse_config_files_and_bindings([path], [])


def test_unknown_param_raises():
    @cfg.configurable
    def k(a=1):
        return a

    cfg.parse_config("k.zzz = 3")
    with pytest.raises(cfg.ConfigError):
        k()


def test_kwargs_configurable_accepts_any():
    @cfg.configurable
    def free(**kw):
        return kw

    cfg.parse_config("free.anything = [1, 2]")
    assert free() == {"anything": [1, 2]}
