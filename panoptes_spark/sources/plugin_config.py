"""Loader for the reference's ``.panoptes-plugin`` definition files.

The reference configures every polling/discovery/enrichment job with an
INI-style plugin definition (yapsy ``PluginInfo`` format — e.g.
``/root/reference/examples/plugins/polling/
plugin_polling_device_interface_metrics.panoptes-plugin``): ``[Core]``
names the plugin, ``[main]`` carries ``execute_frequency`` and the
``resource_filter`` DSL string, ``[snmp]`` carries connection overrides,
``[enrichment] preload`` lists the enrichment namespaces to attach. A
reference user switching engines brings these files with them, so this
module parses them into a typed spec and compiles the spec onto the
Spark surfaces:

- ``resource_filter``   -> ``dsl.resource_filter.ResourceFilter`` (a
  pushdown-friendly WHERE over the resource frame)
- ``execute_frequency`` -> ``operators.schedule.uniform_schedule`` (the
  murmur3 splay the scheduler applies, celery_manager.py:252-254)
- ``preload``           -> (resource, namespace) pairs for the broadcast
  enrichment joins (parse per enrichment.py:660-668)

Reference-parity helpers kept byte-faithful so keys/IDs line up when
migrating stored state:

- ``normalize_plugin_name``: ``_`` doubles, then any non-[A-Za-z0-9_]
  becomes ``_`` (helpers.py:51-68)
- ``plugin_signature``: md5 of normalized name + ``repr(data)``
  (panoptes_base_plugin.py:510-518) — the hash that keys
  ``plugin_metadata:<name>:<signature>:<suffix>`` KV entries
  (panoptes_base_plugin.py:120-131)
"""

from __future__ import annotations

import configparser
import hashlib
import re
from dataclasses import dataclass, field

__all__ = [
    "PluginSpec",
    "load_plugin_config",
    "normalize_plugin_name",
    "plugin_signature",
    "parse_preload",
]


def normalize_plugin_name(plugin_name: str) -> str:
    """Safe plugin name for use in store keys/topics: underscores double
    first, then every other unsafe char maps to ``_``."""
    if not plugin_name:
        raise ValueError("plugin_name must be a non-empty str")
    return re.sub(r"[^A-Za-z0-9_]", "_", plugin_name.replace("_", "__"))


def plugin_signature(plugin_name: str, data: object = None) -> str:
    """The instance signature keying plugin metadata in the KV store:
    md5(normalized_name + repr(data))."""
    return hashlib.md5(
        (normalize_plugin_name(plugin_name) + repr(data)).encode("utf-8")
    ).hexdigest()


def metadata_key(plugin_name: str, data: object, suffix: str) -> str:
    """``plugin_metadata:<normalized>:<signature>:<suffix>`` — the exact
    KV key layout the reference uses for last_executed/last_results."""
    return (
        "plugin_metadata:"
        + normalize_plugin_name(plugin_name)
        + ":"
        + plugin_signature(plugin_name, data)
        + ":"
        + suffix
    )


def parse_preload(spec: str) -> set[tuple[str, str]]:
    """``"self:interface, self:topology"`` -> {(resource, namespace)}."""
    try:
        return {
            (item.split(":")[0].strip(), item.split(":")[1].strip())
            for item in spec.split(",")
        }
    except IndexError as e:
        raise ValueError(f"malformed preload spec {spec!r}: {e}") from None


@dataclass(frozen=True)
class PluginSpec:
    """Typed view of one ``.panoptes-plugin`` file."""

    name: str
    module: str | None
    execute_frequency: int
    resource_filter: str | None
    preload: frozenset[tuple[str, str]] = frozenset()
    snmp: dict[str, str] = field(default_factory=dict)
    extra: dict[str, dict[str, str]] = field(default_factory=dict)

    @property
    def normalized_name(self) -> str:
        return normalize_plugin_name(self.name)

    def signature(self, data: object = None) -> str:
        return plugin_signature(self.name, data)


_KNOWN_SECTIONS = {"Core", "Documentation", "main", "snmp", "enrichment"}


def load_plugin_config(text: str) -> PluginSpec:
    """Parse plugin-definition INI text into a :class:`PluginSpec`.

    (Callers read the file; this stays I/O-free for testability.)
    Unknown sections are preserved verbatim in ``extra`` — plugins are
    free to define their own config blocks and read them at runtime
    (the generic SNMP plugin's OID tables live there).
    """
    cp = configparser.ConfigParser(interpolation=None)
    cp.optionxform = str  # reference keys are case-sensitive (Name, Module)
    cp.read_string(text)
    if "Core" not in cp or "Name" not in cp["Core"]:
        raise ValueError("plugin config needs [Core] Name")
    main = cp["main"] if "main" in cp else {}
    preload: frozenset[tuple[str, str]] = frozenset()
    if "enrichment" in cp and "preload" in cp["enrichment"]:
        preload = frozenset(parse_preload(cp["enrichment"]["preload"]))
    extra = {
        s: dict(cp[s]) for s in cp.sections() if s not in _KNOWN_SECTIONS
    }
    return PluginSpec(
        name=cp["Core"]["Name"],
        module=cp["Core"].get("Module"),
        execute_frequency=int(main.get("execute_frequency", 60)),
        resource_filter=main.get("resource_filter"),
        preload=preload,
        snmp=dict(cp["snmp"]) if "snmp" in cp else {},
        extra=extra,
    )


def compile_plugin(spec: PluginSpec, resources, now: float, id_col: str = "resource_id"):
    """Apply the spec's query surfaces to a resources DataFrame: filter
    by its DSL, then attach the splayed schedule for its frequency (the
    schedule name is ``<normalized_plugin>:<resource_id>``, mirroring
    the per-plugin-per-resource schedule entries the reference's celery
    manager builds).

    Returns the scheduled resource frame (all resource columns +
    ``splay_s`` / ``resumed`` / ``run_at`` from ``uniform_schedule``);
    enrichment preloads and SNMP options stay on the spec for the
    caller's join / connection setup. Map-only on top of the
    (pushdown-compiled) filter.
    """
    from pyspark.sql import functions as F

    from panoptes_spark.dsl.resource_filter import ResourceFilter
    from panoptes_spark.operators.schedule import uniform_schedule

    out = resources
    if spec.resource_filter:
        out = out.where(F.expr(ResourceFilter(spec.resource_filter).to_spark_sql()))
    out = out.withColumn(
        "interval_s", F.lit(int(spec.execute_frequency))
    ).withColumn("last_uniformly_scheduled_at", F.lit(None).cast("double"))
    name_sql = (
        f"concat('{spec.normalized_name}', ':', cast({id_col} as string))"
    )
    return uniform_schedule(out, now, name_col=name_sql)
