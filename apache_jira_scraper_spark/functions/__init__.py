from .core import (
    backoff_sleep_time,
    clean_text,
    has_required_fields,
    parse_jira_timestamp,
    sanitize_filename,
    user_display_name,
)

__all__ = [
    "backoff_sleep_time",
    "clean_text",
    "has_required_fields",
    "parse_jira_timestamp",
    "sanitize_filename",
    "user_display_name",
]
