"""Per-document color registry (font ID → color ID → revision names).

Behavioral spec re-derived from the reference's Colors_List
(`/root/reference/src/parser/analyzer/ParseText.php:691-989`),
including the quirk that key names are stored keyed by PAGE NUMBER
(`handle_key_name`, ParseText.php:831-845).
"""

from __future__ import annotations

from typing import Dict, List, Optional


class ColorsList:
    def __init__(self, font_objects: List[Dict]) -> None:
        self.color_id_array: List[Dict] = []
        self.translation: Dict[str, int] = {}
        self.header_name_by_page: Dict[int, str] = {}
        self.add_colors(font_objects)

    def add_colors(self, font_objects: List[Dict]) -> None:
        for fo in font_objects:
            color = fo.get("COLOR", "")
            font_id = fo.get("ID", "")
            found = False
            for idx, entry in enumerate(self.color_id_array):
                if color == entry["COLOR"]:
                    self.translation[font_id] = idx
                    found = True
                    break
            if not found:
                entry = {
                    "COLOR": color,
                    "NAME": "",
                    "POSSIBLE_NAMES": {},
                    "IMPOSSIBLE_NAMES": {},
                    "KEY_NAMES": {},
                }
                if color == "#000000":
                    entry["SPECIAL_NAME"] = "Normal Text"
                self.color_id_array.append(entry)
                self.translation[font_id] = len(self.color_id_array) - 1

    def get_color_id(self, font_id: str) -> int:
        return self.translation.get(font_id, 0)

    def get_color_hex_code(self, color_id: int) -> str:
        if 0 <= color_id < len(self.color_id_array):
            return self.color_id_array[color_id]["COLOR"]
        return "Hex Code"

    def special_case(self, color_id: int) -> bool:
        return (0 <= color_id < len(self.color_id_array)
                and "SPECIAL_NAME" in self.color_id_array[color_id])

    def handle_possible_name(self, color_id: int, name: str) -> None:
        if 0 <= color_id < len(self.color_id_array):
            names = self.color_id_array[color_id]["POSSIBLE_NAMES"]
            names[name] = names.get(name, 0) + 1

    def handle_key_name(self, color_id: int, name: str, page_num: int) -> None:
        if 0 <= color_id < len(self.color_id_array):
            key_names = self.color_id_array[color_id]["KEY_NAMES"]
            # quirk kept from the reference: first occurrence keyed by
            # page number; repeat NAME keys would increment instead
            if name in key_names:
                key_names[name] += 1
            else:
                key_names[page_num] = name

    def get_key_pairs(self) -> Dict[int, Dict]:
        out: Dict[int, Dict] = {}
        for color_id, entry in enumerate(self.color_id_array):
            for page_num in list(entry["KEY_NAMES"].keys()):
                copy = dict(entry)
                copy["NAME"] = entry["KEY_NAMES"][page_num]
                copy["COLORS_LIST_ID"] = color_id
                out[page_num] = copy
        return out

    def update_ids_with_name(self, ids: List[int], name: str,
                             page_num: int) -> None:
        if len(ids) < 3:
            for color_id in ids:
                if not self.special_case(color_id):
                    self.handle_key_name(color_id, name, page_num)
        for color_id in ids:
            if not self.special_case(color_id):
                self.handle_possible_name(color_id, name)

    def set_header_name_by_page_num(self, page_num: int, name: str) -> None:
        self.header_name_by_page[page_num] = name

    def get_header_name_by_page_num(self, page_num: int) -> Optional[str]:
        return self.header_name_by_page.get(page_num, False)
