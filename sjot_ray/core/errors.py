"""Validation / schema error channel.

The reference throws bare strings (index.js:1247-1269 ``sjot_error``,
index.js:2045-2049 ``sjot_schema_error``). We raise typed exceptions that
carry the structured fields our violation-rows sink needs — ``(datapath,
typepath, what, value_repr)`` — while ``str(exc)`` reproduces the reference's
diagnostic text so message-level tests can assert parity.
"""

from __future__ import annotations

from .jsutil import js_string


class SJOTSchemaError(Exception):
    """Schema admission failure (reference: ``"SJOT schema error: …"``)."""

    def __init__(self, msg: str, typepath: str = ""):
        self.msg = msg
        self.typepath = typepath
        super().__init__(f"SJOT schema error: {typepath} {msg}")


class SJOTValidationError(Exception):
    """Data validation failure.

    Message format mirrors index.js:1247-1269: the ``a`` article depends on
    the shape of the expected type; string data is quoted; the typepath is
    appended with "required by".
    """

    def __init__(self, what: str, data, type_, datapath: str, typepath: str):
        self.what = what
        self.data = data
        self.type = type_
        self.datapath = datapath
        self.typepath = typepath

        a = "is not an object "
        t = type_
        if t == "":
            a = ""
        elif isinstance(t, list):
            if len(t) == 0:
                a = "is not an array "
            elif len(t) == 1 and isinstance(t[0], list):
                a = "is not one of "
            else:
                a = "is not an array of "
        elif isinstance(t, str):
            if t.endswith("]"):
                a = "is not an array "
            elif t.endswith("}"):
                a = "is not a set "
            else:
                a = "is not of type "
        else:
            t = ""

        type_repr = js_string(t) if not isinstance(t, str) else t
        if typepath != "":
            b = ("as required by " if t == "" else " required by ") + typepath
        else:
            b = ""

        if isinstance(data, str):
            msg = f'{datapath} {what} "{data}" {a}{type_repr}{b}'
        elif isinstance(data, (bool, int, float)) or data is None:
            msg = f"{datapath} {what} {js_string(data)} {a}{type_repr}{b}"
        else:
            msg = f"{datapath} {what} {a}{type_repr}{b}"
        self.message = msg
        super().__init__(msg)

    def violation_row(self) -> dict:
        """Structured form for the distributed violations sink."""
        d = self.data
        if isinstance(d, (dict, list)):
            value_repr = ""
        else:
            value_repr = js_string(d)
        return {
            "datapath": self.datapath,
            "typepath": self.typepath,
            "what": self.what,
            "value_repr": value_repr,
        }
