"""Connector option surface, normalization and validation.

Reproduces the option set of the reference
(src/main/java/org/apache/rocketmq/flink/common/RocketMQOptions.java:29-86)
plus the case-insensitive normalization the table factory applies
(source/table/RocketMQDynamicTableSourceFactory.java:171-208). Options are
plain strings (as they arrive from `.option()` calls / OPTIONS clauses).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from datetime import datetime, timezone

# Canonical option names (camelCase like the reference); lookups are
# case-insensitive.
SOURCE_OPTIONS = {
    "topic",
    "consumerGroup",
    "nameServerAddress",
    "tag",
    "sql",  # SQL92-style property filter (reference: broker-side MessageSelector.bySql)
    "startMessageOffset",
    "startTimeMs",
    "startTime",
    "endTime",
    "timeZone",
    "startingOffsets",
    "endingOffsets",
    "endingTimestamp",
    "partitionDiscoveryIntervalMs",
    "useNewApi",
    "encoding",
    "fieldDelimiter",
    "lineDelimiter",
    "columnErrorDebug",
    "lengthCheck",
    "nullValues",
    "headerFields",
    "maxOffsetsPerTrigger",
    "maxRecordsPerPartition",
    "path",  # broker root dir (local simulation of nameServerAddress)
    "codec",  # registered codec name (user plug-point, SURVEY.md 2.7)
    "accessKey",  # ACL credentials (reference: RocketMQConfig.ACCESS_KEY,
    "secretKey",  # SECRET_KEY -> AclClientRPCHook, RocketMQConfig.java:48-49,175-181)
}

SINK_OPTIONS = {
    "topic",
    "producerGroup",
    "nameServerAddress",
    "tag",
    "encoding",
    "fieldDelimiter",
    "lineDelimiter",
    "retryTimes",
    "sleepTimeMs",
    "isDynamicTag",
    "dynamicTagColumn",
    "dynamicTagColumnWriteIncluded",
    "keyColumns",
    "writeKeysToBody",
    "isDynamicProperty",
    "dynamicPropertyColumns",
    "numQueues",
    "path",
    "codec",
    "accessKey",
    "secretKey",
}

KNOWN_OPTIONS = SOURCE_OPTIONS | SINK_OPTIONS

_CANONICAL = {name.lower(): name for name in KNOWN_OPTIONS}

# Defaults mirror RocketMQOptions.java:49-86 where applicable.
DEFAULTS = {
    "tag": "*",
    "encoding": "UTF-8",
    # the reference defaults fieldDelimiter to ctrl-A (RocketMQOptions.java:55,
    # OPTIONAL_FIELD_DELIMITER "\\u0001") -- written as an escape here so the
    # control character is visible in review
    "fieldDelimiter": "\u0001",
    "lineDelimiter": "\n",
    "lengthCheck": "NONE",
    "startingOffsets": "earliest",
    "partitionDiscoveryIntervalMs": "30000",
    "retryTimes": "10",
    "sleepTimeMs": "5000",
    "numQueues": "8",
    # reference default true (RocketMQOptions.java:70)
    "dynamicTagColumnWriteIncluded": "true",
}


class OptionError(ValueError):
    """Invalid or unknown connector option (reference: ValidationException)."""


def normalize_options(options: dict) -> dict:
    """Lowercase-insensitive canonicalization of an options dict.

    Unknown keys raise, mirroring the factory's validation
    (RocketMQDynamicTableSourceFactoryTest checks unknown-option errors).
    Keys prefixed with an underscore are passed through untouched
    (engine-internal knobs).
    """
    out = dict(DEFAULTS)
    for key, val in options.items():
        if key.startswith("_") or key.lower() in {
            "checkpointlocation",
            "queryname",
        }:
            out[key] = val
            continue
        canon = _CANONICAL.get(key.lower())
        if canon is None:
            raise OptionError(f"unsupported option: {key!r}")
        out[canon] = str(val)
    return out


def require(options: dict, *names: str) -> None:
    missing = [n for n in names if not options.get(n)]
    if missing:
        raise OptionError(f"missing required options: {missing}")


def parse_bool(val: str | None, default: bool = False) -> bool:
    if val is None:
        return default
    return str(val).strip().lower() in {"true", "1", "yes"}


def parse_csv(val: str | None) -> list[str]:
    if not val:
        return []
    return [part.strip() for part in str(val).split(",") if part.strip()]


def parse_datetime_ms(text: str, tz_name: str | None = None) -> int:
    """Parse 'yyyy-MM-dd HH:mm:ss' (reference factory format,
    RocketMQDynamicTableSourceFactory.java:114-148) to epoch millis."""
    dt = datetime.strptime(text.strip(), "%Y-%m-%d %H:%M:%S")
    tz = timezone.utc
    if tz_name:
        import zoneinfo

        tz = zoneinfo.ZoneInfo(tz_name)
    return int(dt.replace(tzinfo=tz).timestamp() * 1000)


@dataclass
class DirtyPolicy:
    """Resolved dirty-data strategies for the three failure classes.

    Mirrors DirtyDataStrategy + the lengthCheck presets
    (reference: source/reader/deserializer/RowDeserializationSchema.java:
    284-397 applies them; 538-569 maps the preset; 460-462 defaults
    SKIP/SKIP/CUT for format-error/missing/extra).
    """

    on_format_error: str = "SKIP"  # SKIP | SKIP_SILENT | NULL | EXCEPTION
    on_missing: str = "SKIP"  # SKIP | SKIP_SILENT | PAD | EXCEPTION
    on_extra: str = "CUT"  # CUT | SKIP | SKIP_SILENT | EXCEPTION
    preset: str = "NONE"
    _valid: dict = field(
        default_factory=lambda: {
            "on_format_error": {"SKIP", "SKIP_SILENT", "NULL", "EXCEPTION"},
            "on_missing": {"SKIP", "SKIP_SILENT", "PAD", "EXCEPTION"},
            "on_extra": {"CUT", "SKIP", "SKIP_SILENT", "EXCEPTION"},
        },
        repr=False,
    )

    def __post_init__(self):
        for attr, allowed in self._valid.items():
            if getattr(self, attr) not in allowed:
                raise OptionError(f"invalid {attr}: {getattr(self, attr)}")

    @classmethod
    def from_length_check(cls, preset: str | None) -> "DirtyPolicy":
        preset = (preset or "NONE").upper()
        table = {
            "NONE": cls(preset="NONE"),
            "SKIP": cls("SKIP", "SKIP", "SKIP", preset="SKIP"),
            "SKIP_SILENT": cls(
                "SKIP_SILENT", "SKIP_SILENT", "SKIP_SILENT", preset="SKIP_SILENT"
            ),
            "PAD": cls("NULL", "PAD", "CUT", preset="PAD"),
            "EXCEPTION": cls("EXCEPTION", "EXCEPTION", "EXCEPTION", preset="EXCEPTION"),
        }
        if preset not in table:
            raise OptionError(f"invalid lengthCheck: {preset}")
        return table[preset]
