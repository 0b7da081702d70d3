"""Setup-preflight result type.

Reference: sources/targets return a merged ``Neos\\Error\\Messages\\Result``
of notices/warnings/errors from ``setup()``
(``Classes/ImportService.php:57-63``); the CLI renders them and exits
non-zero on any error or warning
(``Classes/Command/ImportCommandController.php:159-173``).
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class Message:
    severity: str  # "notice" | "warning" | "error"
    text: str


@dataclass
class Result:
    messages: list[Message] = field(default_factory=list)

    def add_notice(self, text: str) -> None:
        self.messages.append(Message("notice", text))

    def add_warning(self, text: str) -> None:
        self.messages.append(Message("warning", text))

    def add_error(self, text: str) -> None:
        self.messages.append(Message("error", text))

    def merge(self, other: "Result") -> "Result":
        self.messages.extend(other.messages)
        return self

    @property
    def has_errors(self) -> bool:
        return any(m.severity == "error" for m in self.messages)

    @property
    def has_warnings(self) -> bool:
        return any(m.severity == "warning" for m in self.messages)

    def render(self) -> str:
        return "\n".join(f"{m.severity.upper()}: {m.text}" for m in self.messages)
