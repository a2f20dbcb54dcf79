"""Plan-shaping helpers: partition layout + plan inspection."""

from .layout import spread  # noqa: F401
