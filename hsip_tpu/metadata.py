"""Metadata field filtering for Photron recordings.

Controls which acquisition-header fields a :class:`~hsip_tpu.video.PhotonVideo`
exposes through its ``metadata`` property. Parity target: reference
``src/photron/metadata.py`` (category frozensets, presets, filter).
"""

from __future__ import annotations

from typing import FrozenSet, Optional, Set

__all__ = ["MetadataConfig"]


class MetadataConfig:
    """Whitelist over the acquisition-header dict.

    Header keys follow the Photron/pyMRAW naming convention:
    'Date', 'Camera Type', 'Record Rate(fps)', 'Shutter Speed(s)',
    'Total Frame', 'Original Total Frame', 'Image Width', 'Image Height',
    'File Format', 'EffectiveBit Depth', 'EffectiveBit Side', 'Color Bit',
    'Comment Text'.

    Example:
        >>> config = MetadataConfig.minimal()          # essential only
        >>> config = MetadataConfig.full()             # everything
        >>> config = MetadataConfig.for_processing()   # essential + recording
        >>> custom = MetadataConfig(fields={'Record Rate(fps)', 'Total Frame'})
    """

    ESSENTIAL: FrozenSet[str] = frozenset(
        {
            "Total Frame",
            "Image Width",
            "Image Height",
            "EffectiveBit Depth",
            "File Format",
        }
    )

    RECORDING: FrozenSet[str] = frozenset(
        {
            "Record Rate(fps)",
            "Shutter Speed(s)",
        }
    )

    DEVICE: FrozenSet[str] = frozenset(
        {
            "Camera Type",
            "Date",
        }
    )

    EXTENDED: FrozenSet[str] = frozenset(
        {
            "Original Total Frame",
            "EffectiveBit Side",
            "Color Bit",
            "Comment Text",
        }
    )

    ALL_FIELDS: FrozenSet[str] = ESSENTIAL | RECORDING | DEVICE | EXTENDED

    def __init__(
        self,
        fields: Optional[Set[str]] = None,
        include_essential: bool = True,
    ):
        self._fields: Set[str] = set()
        if include_essential:
            self._fields.update(self.ESSENTIAL)
        if fields is not None:
            self._fields.update(fields)

    @classmethod
    def minimal(cls) -> "MetadataConfig":
        """Essential fields only."""
        return cls(include_essential=True)

    @classmethod
    def full(cls) -> "MetadataConfig":
        """All known fields."""
        return cls(fields=cls.ALL_FIELDS, include_essential=True)

    @classmethod
    def for_processing(cls) -> "MetadataConfig":
        """Essential + recording fields — the default for processing runs."""
        return cls(fields=cls.ESSENTIAL | cls.RECORDING, include_essential=True)

    @property
    def fields(self) -> Set[str]:
        return self._fields.copy()

    def should_include(self, field_name: str) -> bool:
        return field_name in self._fields

    def filter_metadata(self, raw_metadata: dict) -> dict:
        """Keep only whitelisted keys of the raw header dict."""
        return {k: v for k, v in raw_metadata.items() if self.should_include(k)}

    def __repr__(self) -> str:
        return f"MetadataConfig(fields={sorted(self._fields)})"
