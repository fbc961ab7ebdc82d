"""pdftohtml-style page-XML → LineObjects (line assembly).

Behavioral spec re-derived from the reference's per-page XML walk
(`/root/reference/src/parser/analyzer/ParseText.php:48-121` (sxiToArray)
and `:266-591` (processPageXmlObject)).  Semantics preserved exactly:

* changebar `*` filter (LEFT>500, trimmed value "*") — :280-284
* line bucketing by TOP with ±4 tolerance, LEFT collision → left+1 — :286-311
* fontspec pt→px via floor(size*4/3), 13–15 px snapped to 16 — :313-333
* CONTINUED scrub at page edges setting per-doc flags — :366-398
* header zone (top ≤ 42): dedupe, docx 10-space split, auto-text drop,
  page-number capture — :400-437
* footer zone (top > pageHeight-50) — :441-449
* blank-line synthesis every 12 px from lastTopOffset (init 72) — :469-475
* left/right scene-number capture (LEFT<65 / >520, len<7) — :492-502
* inter-fragment gap → floor(gap/7) spaces — :515-524
* outer-fragment-only trims shifting x by trimmed*7 — :133-264,536-539
* per-page "\f" sentinel line — :587
"""

from __future__ import annotations

import math
import re
import xml.etree.ElementTree as ET
from typing import Dict, List, Optional, Tuple

from .colors_list import ColorsList

INCH = 72
MAX_OFFSET_SAME_LINE = 4
FONT_CONVERSION_RATE = 4 / 3
DEFAULT_CHAR_WIDTH = 7
BASIC_LINE_HEIGHT = 12

AUTO_HEADER_FOOTER_TEXT = (
    "Created using Celtx",
    "Written with Arc Studio: www.arcstudiopro.com",
    "(Printed with the demonstration version of Fade In)",
)

# ASCII whitespace per PCRE \s (no Unicode property flag) plus NUL
_CUSTOM_LTRIM = re.compile(r"^[ \t\n\r\f\x0b\x00]+")
_CUSTOM_RTRIM = re.compile(r"[ \t\n\r\f\x0b\x00]+$")
_CONTINUED_TOP = re.compile(r"^CONTINUED:$")
_CONTINUED_TOP_NUM = re.compile(r"^CONTINUED: ?(?:\(\d+\))?$")
_CONTINUED_BOTTOM = re.compile(r"^\(CONTINUED\)$")
_GIVEN_PAGE_NUM = re.compile(
    r"^\d+[a-zA-Z. ]?[a-zA-Z. ]?[a-zA-Z. ]?[a-zA-Z. ]?$")

_PHP_TRIM = " \t\n\r\x00\x0b"
_NBS_RTRIM = " \n\r\t\x0b\x00 "


def custom_ltrim(s: str) -> str:
    return _CUSTOM_LTRIM.sub("", s)


def custom_rtrim(s: str) -> str:
    return _CUSTOM_RTRIM.sub("", s)


class LineObject:
    __slots__ = ("text", "x", "width", "given_page_num", "line_colors",
                 "line_font_size", "line_text_attributes", "line_number_object")

    def __init__(self, text: str, x: int, width: int, given_page_num,
                 line_colors: Dict, line_font_size, line_text_attributes: Dict,
                 line_number_object: Dict) -> None:
        self.text = text
        self.x = x
        self.width = width
        self.given_page_num = given_page_num
        self.line_colors = line_colors
        self.line_font_size = line_font_size
        self.line_text_attributes = line_text_attributes
        self.line_number_object = line_number_object

    def __repr__(self) -> str:  # debug only
        return f"<Line x={self.x} {self.text[:40]!r}>"


class DocState:
    """Per-document fold state threaded through all pages."""

    def __init__(self) -> None:
        self.fonts: Dict[str, Dict] = {}
        self.colors: Optional[ColorsList] = None
        self.line_objects: List[LineObject] = []
        self.header_objects: List[List[Dict]] = []
        self.footer_objects: List[List[Dict]] = []
        self.dirty_internal_page_num = 0
        self.scene_continued_top = False
        self.scene_continued_bottom = False
        self.scene_continued_number = False
        self.page_size = "Letter"


def _xml_node(elem: ET.Element) -> Dict:
    """One parsed node in the reference's dict shape: tag / value /
    attributes (uppercased keys) / textAttributes ({start,end} char
    ranges for element children of <text>)."""
    node = {
        "tag": elem.tag.upper(),
        "attributes": {k.upper(): v for k, v in elem.attrib.items()},
    }
    if node["tag"] == "TEXT":
        node["value"] = "".join(elem.itertext())
        handled = len(elem.text or "")
        text_attrs: Dict[str, List[Dict]] = {}
        for child in elem:
            child_text = "".join(child.itertext())
            clen = len(child_text)
            text_attrs.setdefault(child.tag, []).append(
                {"start": handled, "end": handled + clen - 1})
            handled += clen + 0
            handled += len(child.tail or "")
        if text_attrs:
            node["textAttributes"] = text_attrs
    else:
        node["value"] = elem.text or ""
    return node


def _trim_return_how_much_cut(value: str, do_left: bool, do_right: bool) -> Dict:
    out = {"leftTrimmed": 0, "rightTrimmed": 0, "value": value}
    if do_left:
        n = len(out["value"])
        out["value"] = custom_ltrim(out["value"])
        out["leftTrimmed"] = n - len(out["value"])
    if do_right:
        n = len(out["value"])
        out["value"] = custom_rtrim(out["value"])
        out["rightTrimmed"] = n - len(out["value"])
    return out


def _add_value_to_line_content(obj: Dict, line_content: str, trim_left: bool,
                               trim_right: bool,
                               line_text_attributes: Dict) -> Tuple[Dict, str, str]:
    """Returns (trim_info, new_line_content_str, appended_str)."""
    val = _trim_return_how_much_cut(obj["value"], trim_left, trim_right)
    appended = ""
    if val["value"] != "":
        text_length_before = len(line_content)
        for attr, entries in obj.get("textAttributes", {}).items():
            for entry in entries:
                if entry["end"] < val["leftTrimmed"]:
                    continue
                if entry["start"] >= len(val["value"]) + val["leftTrimmed"]:
                    continue
                start = max(entry["start"] - val["leftTrimmed"], 0) + text_length_before
                end = min(entry["end"] - val["leftTrimmed"],
                          len(val["value"]) - 1) + text_length_before
                line_text_attributes.setdefault(attr, []).append(
                    {"start": start, "end": end})
        appended = val["value"]
    return val, appended, appended


def _line_object_compare(o1: Optional[Dict], o2: Optional[Dict]) -> bool:
    if not o1 or not o2:
        return False
    a1, a2 = o1["attributes"], o2["attributes"]
    return (o1["tag"] == o2["tag"] and o1["value"] == o2["value"]
            and a1.get("TOP") == a2.get("TOP")
            and a1.get("LEFT") == a2.get("LEFT")
            and a1.get("WIDTH") == a2.get("WIDTH")
            and a1.get("HEIGHT") == a2.get("HEIGHT")
            and a1.get("FONT") == a2.get("FONT"))


def _calculate_which_keys_to_trim(line_objects: Dict[int, Dict]) -> Dict[int, Dict]:
    out = {k: {"trimLeft": False, "trimRight": False} for k in line_objects}
    for k, obj in line_objects.items():
        out[k]["trimLeft"] = True
        if custom_ltrim(obj["value"]) != "":
            break
    for k in reversed(list(line_objects.keys())):
        out[k]["trimRight"] = True
        if custom_rtrim(line_objects[k]["value"]) != "":
            break
    return out


def process_page_xml(page_xml: str, state: DocState) -> None:
    """Process one <page> element, appending LineObjects (+ final "\f"
    sentinel) and header/footer capture to the document state."""
    page = ET.fromstring(page_xml)
    page_node_attrs = {k.upper(): v for k, v in page.attrib.items()}
    page_height = int(float(page_node_attrs.get("HEIGHT", 792)))

    state.page_size = "A4" if page_height > 800 else "Letter"

    lines_in_page: Dict[int, Dict[int, Dict]] = {}
    font_spec_flag = False
    font_objects_local: List[Dict] = []

    for elem in page:
        tag = elem.tag.upper()
        if tag == "TEXT":
            node = _xml_node(elem)
            attrs = node["attributes"]
            left_attr = int(float(attrs.get("LEFT", 0)))
            if left_attr > 500 and node["value"].strip(_PHP_TRIM) == "*":
                continue  # changebar asterisks
            top = int(float(attrs.get("TOP", 0)))
            left = left_attr
            for offset in range(-MAX_OFFSET_SAME_LINE, MAX_OFFSET_SAME_LINE + 1):
                if (top + offset) in lines_in_page:
                    top = top + offset
                    break
            bucket = lines_in_page.setdefault(top, {})
            while left in bucket:
                left += 1
            bucket[left] = node
        elif tag == "FONTSPEC":
            font_spec_flag = True
            attrs = {k.upper(): v for k, v in elem.attrib.items()}
            points = float(attrs.get("SIZE", 12))
            px = math.floor(points * FONT_CONVERSION_RATE)
            if 13 <= px < 16:
                # Microsoft-Print-to-PDF font-size snap
                px = 16
            attrs["SIZE"] = px
            font_objects_local.append(attrs)
            state.fonts[attrs.get("ID", "")] = attrs

    if state.colors is None:
        state.colors = ColorsList(font_objects_local)
    elif font_spec_flag:
        state.colors.add_colors(font_objects_local)
    colors = state.colors

    last_top_offset = 72  # default top padding
    given_page_num = ""
    header_objects: List[Dict] = []
    footer_objects: List[Dict] = []
    fonts_in_page: Dict[int, int] = {}

    for top in sorted(lines_in_page.keys()):
        line_objects = lines_in_page[top]
        line_content = ""
        line_colors: Dict[int, List[Dict]] = {}
        line_text_attributes: Dict[str, List[Dict]] = {}

        if top <= INCH // 2 + 14:
            for key in list(line_objects.keys()):
                v = line_objects[key]["value"].strip(_PHP_TRIM)
                if _CONTINUED_TOP.match(v):
                    state.scene_continued_top = True
                    del line_objects[key]
                elif _CONTINUED_TOP_NUM.match(v):
                    state.scene_continued_top = True
                    state.scene_continued_number = True
                    del line_objects[key]
        if top > page_height - INCH // 2 - 29:
            for key in list(line_objects.keys()):
                v = line_objects[key]["value"].strip(_PHP_TRIM)
                if _CONTINUED_BOTTOM.match(v):
                    state.scene_continued_bottom = True
                    del line_objects[key]

        if top <= INCH // 2 + 6:
            prev_obj: Optional[Dict] = None
            work = list(line_objects.values())
            idx = 0
            while idx < len(work):
                obj = dict(work[idx])  # the reference mutates a COPY
                non_duplicate = not _line_object_compare(prev_obj, work[idx])
                prev_obj = work[idx]
                if non_duplicate:
                    obj["value"] = obj["value"].strip(_PHP_TRIM)
                    if "          " in obj["value"]:
                        first, second = obj["value"].split("          ", 1)
                        obj["value"] = first.strip(_PHP_TRIM)
                        copy = dict(obj)
                        copy["value"] = second.strip(_PHP_TRIM)
                        work.append(copy)
                    if obj["value"] not in AUTO_HEADER_FOOTER_TEXT:
                        m = _GIVEN_PAGE_NUM.match(obj["value"])
                        if m:
                            given_page_num = m.group(0).rstrip(". ")
                        else:
                            header_objects.append(obj)
                idx += 1
        elif top > page_height - INCH // 2 - 14:
            for obj in line_objects.values():
                if obj["value"].strip(_PHP_TRIM) not in AUTO_HEADER_FOOTER_TEXT:
                    footer_objects.append(obj)
        else:
            spacing_top = last_top_offset
            while spacing_top <= top - BASIC_LINE_HEIGHT + MAX_OFFSET_SAME_LINE:
                state.line_objects.append(
                    LineObject("", 0, 0, given_page_num, {}, 16, {}, {}))
                spacing_top += BASIC_LINE_HEIGHT

            left = 1000000
            right = 0
            line_font_size = 0
            line_number_object: Dict = {}
            last_obj_right = 0
            sorted_objects = {k: line_objects[k] for k in sorted(line_objects)}
            key_trim = _calculate_which_keys_to_trim(sorted_objects)
            for key, obj in sorted_objects.items():
                text = obj["value"].rstrip(_NBS_RTRIM)
                obj_left = int(float(obj["attributes"].get("LEFT", 0)))
                obj_right = obj_left + int(float(obj["attributes"].get("WIDTH", 0)))
                if text != "" and obj_left < 65 and len(text) < 7:
                    line_number_object["number"] = text
                    line_number_object["left"] = 1
                elif text != "" and obj_left > 520 and len(text) < 7:
                    line_number_object["number"] = text
                    line_number_object["right"] = 1
                else:
                    font_id = obj["attributes"].get("FONT", "")
                    color_id = colors.get_color_id(font_id)
                    text_length_before = len(line_content)
                    font_size_px = state.fonts.get(font_id, {}).get("SIZE", 16)
                    if text != "" or line_font_size == 0:
                        line_font_size = max(
                            line_font_size if line_content != "" else 0,
                            font_size_px if text != "" else min(
                                math.floor(BASIC_LINE_HEIGHT * FONT_CONVERSION_RATE),
                                font_size_px))
                    if text != "" and line_content != "" and last_obj_right != 0:
                        n_spaces = math.floor(
                            (obj_left - last_obj_right) / DEFAULT_CHAR_WIDTH)
                        if n_spaces > 0:
                            line_content += " " * n_spaces
                    prior_line_content = line_content
                    trim_info, new_content, appended = _add_value_to_line_content(
                        obj, line_content, key_trim[key]["trimLeft"],
                        key_trim[key]["trimRight"], line_text_attributes)
                    line_content += appended
                    obj_left += trim_info["leftTrimmed"] * DEFAULT_CHAR_WIDTH
                    obj_right -= trim_info["rightTrimmed"] * DEFAULT_CHAR_WIDTH
                    if not colors.special_case(color_id):
                        line_colors.setdefault(color_id, []).append(
                            {"start": text_length_before, "end": len(line_content)})
                    height_attr = int(float(obj["attributes"].get("HEIGHT", 0)))
                    last_top_offset = max(
                        last_top_offset,
                        top + (height_attr if text != ""
                               else min(BASIC_LINE_HEIGHT, height_attr)))
                    if prior_line_content != "":
                        if new_content != "":
                            left = min(left, obj_left)
                            right = max(right, obj_right)
                    else:
                        left = obj_left
                        right = obj_right
                    fonts_in_page[color_id] = fonts_in_page.get(color_id, 0) + 1
                    last_obj_right = obj_right
            state.line_objects.append(
                LineObject(line_content, left, right - left, given_page_num,
                           line_colors, line_font_size, line_text_attributes,
                           line_number_object))

    header_objects.sort(key=lambda o: int(float(o["attributes"].get("LEFT", 0))))
    if header_objects:
        possible_name = header_objects[0]["value"]
        colors.update_ids_with_name(list(fonts_in_page.keys()), possible_name,
                                    state.dirty_internal_page_num)
        colors.set_header_name_by_page_num(state.dirty_internal_page_num,
                                           possible_name)
    state.dirty_internal_page_num += 1
    state.line_objects.append(
        LineObject("\f", 0, 0, given_page_num, {}, 16, {}, {}))
    state.header_objects.append(header_objects)
    state.footer_objects.append(footer_objects)
