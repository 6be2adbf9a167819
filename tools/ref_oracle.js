// Differential-test oracle: runs the REFERENCE validator (read-only at
// /root/reference) over JSON-lines cases from stdin and reports verdicts.
// Used only by the test suite to cross-check sjot_ray.core conformance.
//
// stdin:  one JSON object per line: {"data": ..., "type": ..., "schema": ...,
//         "mode": "validate"|"check"}
// stdout: one JSON object per line: {"valid": bool, "error": str|null,
//         "data": <possibly-normalized data>}
"use strict";

const SJOT = require("/root/reference/index.js");

const lines = require("fs").readFileSync(0, "utf8").split("\n");
const out = [];
for (const line of lines) {
  if (!line.trim()) continue;
  const c = JSON.parse(line);
  let res;
  try {
    if (c.mode === "check") {
      SJOT.check(c.schema);
      res = { valid: true, error: null, data: null };
    } else {
      SJOT.validate(c.data, c.type === undefined ? null : c.type, c.schema);
      res = { valid: true, error: null, data: c.data === undefined ? null : c.data };
    }
  } catch (e) {
    res = { valid: false, error: String(e), data: c.data === undefined ? null : c.data };
  }
  out.push(JSON.stringify(res));
}
process.stdout.write(out.join("\n") + "\n");
