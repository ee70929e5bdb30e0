"""X3: Kafka OAuth provider strategy (reference kafka_oauth/__init__.py:10-55,
aws_msk.py:16-61)."""

from __future__ import annotations

import pytest

from sqlserver_cdc_to_kafka_spark.kafka_oauth import (
    KafkaOauthProviderAbstract,
    StaticTokenProvider,
    as_kafka_options,
    get_kafka_oauth_provider,
)


def test_unconfigured_returns_none():
    assert get_kafka_oauth_provider(None) is None
    assert get_kafka_oauth_provider("") is None


def test_dotted_path_loads_builtin_provider_and_callbacks_fire():
    p = get_kafka_oauth_provider(
        "sqlserver_cdc_to_kafka_spark.kafka_oauth.StaticTokenProvider",
        {"token": "tok-123", "ttl_seconds": 60},
    )
    assert isinstance(p, StaticTokenProvider)
    for cb in (p.consumer_oauth_cb, p.producer_oauth_cb, p.admin_oauth_cb):
        token, expiry = cb("ignored-config-str")
        assert token == "tok-123"
        assert expiry > 0
    opts = as_kafka_options(p)
    assert opts["kafka.sasl.mechanism"] == "OAUTHBEARER"


def test_token_file_reread_on_expiry(tmp_path):
    tf = tmp_path / "token"
    tf.write_text("first\n")
    p = StaticTokenProvider(token_file=str(tf), ttl_seconds=0.0)  # always expired
    assert p.consumer_oauth_cb("")[0] == "first"
    tf.write_text("second\n")
    assert p.producer_oauth_cb("")[0] == "second"  # re-fetched, not cached


def test_token_cached_until_expiry(tmp_path):
    tf = tmp_path / "token"
    tf.write_text("first")
    p = StaticTokenProvider(token_file=str(tf), ttl_seconds=3600.0)
    assert p.consumer_oauth_cb("")[0] == "first"
    tf.write_text("second")
    assert p.admin_oauth_cb("")[0] == "first"  # cached: ttl not reached


def test_custom_provider_class_via_dotted_path():
    token, _ = get_kafka_oauth_provider(
        f"{__name__}.FakeSignerProvider", {"region": "us-east-1"}
    ).producer_oauth_cb("")
    assert token == "signed:us-east-1"


def test_non_provider_class_rejected():
    with pytest.raises(TypeError):
        get_kafka_oauth_provider("builtins.dict")


def test_missing_config_raises():
    with pytest.raises(ValueError):
        StaticTokenProvider()


class FakeSignerProvider(KafkaOauthProviderAbstract):
    """Stands in for a cloud signer impl (the aws_msk analog users plug in)."""

    def __init__(self, region: str) -> None:
        self.region = region

    def _cb(self):
        return f"signed:{self.region}", 9e9

    def consumer_oauth_cb(self, config_str: str):
        return self._cb()

    def producer_oauth_cb(self, config_str: str):
        return self._cb()

    def admin_oauth_cb(self, config_str: str):
        return self._cb()

    @classmethod
    def construct_with_options(cls, opts: dict) -> "FakeSignerProvider":
        return cls(region=opts["region"])
