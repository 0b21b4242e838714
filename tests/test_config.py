import pytest

from tmv_tpu.core.config import Config, eval_str_fn


class TestConfig:
    def test_nested_attr_access(self):
        c = Config({"a": 1, "b": {"c": 2, "d": {"e": 3}}})
        assert c.a == 1 and c.b.c == 2 and c.b.d.e == 3
        assert c["b"]["c"] == 2

    def test_update_allows_new_keys(self):
        c = Config({"a": 1})
        c.update({"b": {"x": 2}})
        assert c.b.x == 2

    def test_override_rejects_new_keys(self):
        c = Config({"a": 1})
        with pytest.raises(KeyError):
            c.override({"zz": 2})

    def test_override_kv_string(self):
        c = Config({"x": {"y": 1, "z": "s"}, "flag": False})
        c.override("x.y=5,flag=true,x.z=hello")
        assert c.x.y == 5 and c.flag is True and c.x.z == "hello"

    def test_override_nested_merge_preserves_siblings(self):
        c = Config({"x": {"y": 1, "z": 2}})
        c.override({"x": {"y": 9}})
        assert c.x.y == 9 and c.x.z == 2

    def test_yaml_roundtrip(self, tmp_path):
        c = Config({"a": 1, "b": {"c": [1, 2, 3]}})
        p = str(tmp_path / "cfg.yaml")
        c.save_to_yaml(p)
        c2 = Config({"a": 0, "b": {"c": None}})
        c2.override(p)
        assert c2.as_dict() == c.as_dict()

    def test_eval_str_fn(self):
        assert eval_str_fn("true") is True
        assert eval_str_fn("3.5") == 3.5
        assert eval_str_fn("(1,2)") == (1, 2)
        assert eval_str_fn("plain") == "plain"

    def test_frozen_hashable(self):
        c = Config({"a": 1, "b": {"c": [1, 2]}})
        assert hash(c.frozen()) == hash(Config(c.as_dict()).frozen())
