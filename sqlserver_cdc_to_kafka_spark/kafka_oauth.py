"""Kafka OAuth provider strategy (SURVEY §2.10 X3).

Reference: ``cdc_kafka/kafka_oauth/__init__.py:10-55`` — an abstract provider
with three token callbacks (consumer / producer / admin), each returning
``(token, expiry_epoch_seconds)``, resolved from a ``module.Class`` dotted
path in config and handed to the Kafka client's SASL/OAUTHBEARER machinery;
``kafka_oauth/aws_msk.py:16-61`` ships a concrete cached-token impl.

Spark restatement: Spark's Kafka source/sink takes the same callbacks via
``kafka.sasl.login.callback.handler.class`` JVM-side, but a Python-side
provider is still the operator surface users configure — so the strategy
protocol, dotted-path loading, and the expiry-cached concrete provider are
re-expressed here 1:1. The environment has no broker or AWS signer, so the
shipped concrete impl is config/env-driven (static or file-sourced tokens
with expiry), and ``as_kafka_options`` turns any provider into the option
dict a real Spark Kafka sink would take.
"""

from __future__ import annotations

import importlib
import os
import time
from abc import ABC, abstractmethod


class KafkaOauthProviderAbstract(ABC):
    """The reference's provider protocol: three callbacks, each returning
    ``(token, expiry_epoch_seconds)``. ``config_str`` is the client's
    opaque SASL config passthrough (unused by most impls)."""

    @abstractmethod
    def consumer_oauth_cb(self, config_str: str) -> tuple[str, float]: ...

    @abstractmethod
    def producer_oauth_cb(self, config_str: str) -> tuple[str, float]: ...

    @abstractmethod
    def admin_oauth_cb(self, config_str: str) -> tuple[str, float]: ...

    @classmethod
    def construct_with_options(cls, opts: dict) -> "KafkaOauthProviderAbstract":
        """Reference ``construct_with_options``: build from a config/env
        mapping. Default: no-arg construction."""
        return cls()  # type: ignore[call-arg]


class StaticTokenProvider(KafkaOauthProviderAbstract):
    """Concrete provider with the aws_msk.py:16-61 *shape* — a cached token
    re-fetched only when expired — minus the cloud signer the environment
    lacks. The token comes from config (``token``) or a file path
    (``token_file``, re-read on expiry: the k8s projected-volume pattern);
    ``ttl_seconds`` drives the expiry the callbacks report."""

    def __init__(
        self,
        token: str | None = None,
        token_file: str | None = None,
        ttl_seconds: float = 900.0,
    ) -> None:
        if token is None and token_file is None:
            raise ValueError("StaticTokenProvider needs `token` or `token_file`")
        self._token_cfg = token
        self._token_file = token_file
        self._ttl = ttl_seconds
        self._token: str = ""
        self._expiry_ts: float = 0.0

    def _common_cb(self) -> tuple[str, float]:
        now = time.time()
        if not self._token or now > self._expiry_ts:
            if self._token_file is not None:
                with open(self._token_file) as f:
                    self._token = f.read().strip()
            else:
                self._token = self._token_cfg or ""
            self._expiry_ts = now + self._ttl
        return self._token, self._expiry_ts

    def consumer_oauth_cb(self, config_str: str) -> tuple[str, float]:
        return self._common_cb()

    def producer_oauth_cb(self, config_str: str) -> tuple[str, float]:
        return self._common_cb()

    def admin_oauth_cb(self, config_str: str) -> tuple[str, float]:
        return self._common_cb()

    @classmethod
    def construct_with_options(cls, opts: dict) -> "StaticTokenProvider":
        return cls(
            token=opts.get("token") or os.environ.get("KAFKA_OAUTH_TOKEN"),
            token_file=opts.get("token_file"),
            ttl_seconds=float(opts.get("ttl_seconds", 900.0)),
        )


def get_kafka_oauth_provider(
    dotted_path: str | None, opts: dict | None = None
) -> KafkaOauthProviderAbstract | None:
    """Reference ``get_kafka_oauth_provider`` (kafka_oauth/__init__.py:42-55):
    resolve ``module.Class`` by dotted path (same mechanism as serializer /
    reporter loading), construct with the config mapping, return None when
    unconfigured."""
    if not dotted_path:
        return None
    module_name, class_name = dotted_path.rsplit(".", 1)
    cls = getattr(importlib.import_module(module_name), class_name)
    if not (isinstance(cls, type) and issubclass(cls, KafkaOauthProviderAbstract)):
        raise TypeError(f"{dotted_path} is not a KafkaOauthProviderAbstract")
    return cls.construct_with_options(opts or {})


def as_kafka_options(provider: KafkaOauthProviderAbstract) -> dict[str, str]:
    """The option dict a Spark Kafka sink/source needs for SASL/OAUTHBEARER;
    the token callback itself stays Python-side via the provider."""
    return {
        "kafka.security.protocol": "SASL_SSL",
        "kafka.sasl.mechanism": "OAUTHBEARER",
    }
