import pytest

from segmentron_tpu.utils.registry import Registry


def test_register_and_get():
    reg = Registry("test")

    @reg.register()
    class Foo:
        pass

    reg.register(name="bar")(lambda: 42)
    assert reg.get("Foo") is Foo
    assert reg.get("bar")() == 42
    assert "Foo" in reg
    assert len(reg) == 2


def test_duplicate_raises():
    reg = Registry("test")
    reg.register(name="x")(object)
    with pytest.raises(KeyError):
        reg.register(name="x")(object)


def test_missing_raises():
    reg = Registry("test")
    with pytest.raises(KeyError):
        reg.get("nope")
