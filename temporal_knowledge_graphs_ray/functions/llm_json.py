"""LLM-response JSON repair (M9).

Replicates the reference's post-processing of LLM extraction responses
(/root/reference/src/temporal_kg_rag/ingestion/entity_extractor.py:213-269):

1. strip markdown code fences (```json ... ``` first, bare ``` second),
2. ``json.loads``; a non-list dict is wrapped in a list, any other
   non-list becomes [],
3. on decode failure, slice from the first '[' to the last ']' (completing
   a truncated array at the last '}' when the closing bracket is missing),
   normalize single quotes to double quotes and drop trailing commas,
   retry; final fallback is [].

Pure function — usable inside any actor-pool extractor stage as the
response postprocessor for a real LLM client.
"""

from __future__ import annotations

import json


def strip_code_fences(content: str) -> str:
    """Markdown fence stripping, exactly the reference's split logic."""
    if "```json" in content:
        return content.split("```json")[1].split("```")[0].strip()
    if "```" in content:
        return content.split("```")[1].split("```")[0].strip()
    return content


def parse_llm_entities(content: str) -> list:
    """Fault-tolerant parse of an LLM entity-extraction response."""
    content = content.strip()
    content = strip_code_fences(content)
    try:
        entities = json.loads(content)
        if not isinstance(entities, list):
            return [entities] if isinstance(entities, dict) else []
        return entities
    except json.JSONDecodeError:
        pass
    # bracket-slice recovery (reference entity_extractor.py:238-266)
    start = content.find("[")
    end = content.rfind("]")
    if start == -1:
        return []
    if end == -1 or end < start:
        last_brace = content.rfind("}")
        if last_brace > start:
            json_str = content[start:last_brace + 1] + "]"
        else:
            json_str = "[]"
    else:
        json_str = content[start:end + 1]
    json_str = json_str.replace("'", '"')
    json_str = json_str.replace(",]", "]")
    json_str = json_str.replace(",}", "}")
    try:
        out = json.loads(json_str)
        return out if isinstance(out, list) else []
    except json.JSONDecodeError:
        return []
