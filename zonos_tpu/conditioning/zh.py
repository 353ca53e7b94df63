"""Dictionary-free Mandarin reading fallback: hanzi → pinyin → IPA.

The reference resolves Chinese ("cmn"/"yue") through eSpeak NG
(/root/reference/zonos/conditioning.py:291-335, language list :525-536, 109 codes),
which ships a full hanzi dictionary. Without espeak, hanzi would previously
degrade to the grapheme tier — and the model's symbol table has no CJK
characters, so every one became UNK (total loss). This module raises
Mandarin to intelligible the same way ``conditioning/ja.py`` does Japanese:

* an embedded frequency-ranked hanzi → pinyin table (~1200 characters,
  covering ≈95% of running text) plus a word lexicon for the common
  polyphonic characters (的/得/地, 行 xíng/háng, 长 cháng/zhǎng,
  重 zhòng/chóng, 乐 lè/yuè, 都 dōu/dū, …) disambiguated by Viterbi
  segmentation exactly as in ja.py;
* an exact Arabic-numeral reader (一 through 万亿 scale, 两-selection
  before measure words);
* a regular pinyin → IPA mapping (Standard Mandarin initials/finals).
  TONES ARE DROPPED — the model's phoneme table has no tone letters
  (conditioning/text.py _letters_ipa), the same explicit decision as the
  Vietnamese engine. Intonation is lost; segments remain intelligible.

Cantonese ("yue") has no separate reading table; it routes through the
Mandarin readings with a loud one-time warning (still far better than the
all-UNK grapheme tier for a hanzi text).
"""

from __future__ import annotations

import logging
import re

logger = logging.getLogger(__name__)

# ---------------------------------------------------------------------------
# Pinyin → IPA (Standard Mandarin; tones dropped)
# ---------------------------------------------------------------------------

_INITIALS = [
    ("zh", "ʈʂ"), ("ch", "ʈʂʰ"), ("sh", "ʂ"),
    ("b", "p"), ("p", "pʰ"), ("m", "m"), ("f", "f"),
    ("d", "t"), ("t", "tʰ"), ("n", "n"), ("l", "l"),
    ("g", "k"), ("k", "kʰ"), ("h", "x"),
    ("j", "tɕ"), ("q", "tɕʰ"), ("x", "ɕ"),
    ("r", "ʐ"), ("z", "ts"), ("c", "tsʰ"), ("s", "s"),
]

# Finals, longest first. ü is written v in the embedded tables.
_FINALS = [
    ("iang", "jaŋ"), ("iong", "jʊŋ"), ("uang", "waŋ"), ("ueng", "wəŋ"),
    ("ian", "jɛn"), ("iao", "jaw"), ("ang", "aŋ"), ("eng", "əŋ"),
    ("ong", "ʊŋ"), ("uai", "waj"), ("uan", "wan"), ("van", "ɥɛn"),
    ("ai", "aj"), ("ao", "aw"), ("an", "an"), ("ei", "ej"), ("en", "ən"),
    ("er", "ɚ"), ("ia", "ja"), ("ie", "jɛ"), ("in", "in"), ("ing", "iŋ"),
    ("iu", "jow"), ("ou", "ow"), ("ua", "wa"), ("uo", "wo"), ("ui", "wej"),
    ("un", "wən"), ("ue", "ɥɛ"), ("ve", "ɥɛ"), ("vn", "yn"),
    ("uen", "wən"), ("iou", "jow"), ("uei", "wej"), ("uin", "win"),
    ("a", "a"), ("e", "ɤ"), ("i", "i"), ("o", "o"), ("u", "u"), ("v", "y"),
]

# i after sibilants is the apical vowel, not /i/.
_APICAL = {"z", "c", "s", "zh", "ch", "sh", "r"}


def pinyin_to_ipa(syllable: str) -> str:
    """One toneless pinyin syllable → IPA ('' for empty/unknown)."""
    s = syllable.strip().lower()
    if not s:
        return ""
    # y/w onsets are orthographic forms of i/u finals.
    if s.startswith("yu"):
        s = "v" + s[2:]
    elif s.startswith("yi"):
        s = "i" + s[2:]
    elif s.startswith("y"):
        s = "i" + s[1:]
    if s.startswith("wu"):
        s = "u" + s[2:]
    elif s.startswith("w"):
        s = "u" + s[1:]

    initial, ipa_init = "", ""
    for pin, ipa in _INITIALS:
        if s.startswith(pin):
            initial, ipa_init = pin, ipa
            s = s[len(pin):]
            break

    if s == "i" and initial in _APICAL:
        return ipa_init + "ɨ"
    # ju/qu/xu spell ü.
    if initial in ("j", "q", "x") and s.startswith("u"):
        s = "v" + s[1:]
    # Bare finals starting with i/u after no initial → glide onset.
    for pin, ipa in _FINALS:
        if s == pin:
            out = ipa_init + ipa
            # A final-initial i/u with no onset consonant becomes a glide+vowel;
            # the _FINALS values already encode medials (j/w), so only the bare
            # "i"/"u"/"v" nucleus needs nothing extra.
            return out
    # Unknown tail: emit what we can, vowel-letter by letter.
    plain = {"a": "a", "e": "ɤ", "i": "i", "o": "o", "u": "u", "v": "y", "n": "n", "g": "ŋ", "r": "ɚ"}
    return ipa_init + "".join(plain.get(c, "") for c in s)


# ---------------------------------------------------------------------------
# Numbers
# ---------------------------------------------------------------------------

_DIGIT_PY = ["ling", "yi", "er", "san", "si", "wu", "liu", "qi", "ba", "jiu"]


def number_to_pinyin(n: int, *, liang: bool = False) -> str:
    """Non-negative integer → space-separated toneless pinyin."""
    if n == 0:
        return "ling"
    if n >= 10**12:
        return " ".join(_DIGIT_PY[int(c)] for c in str(n))

    def four(k: int, leading_unit: bool) -> list[str]:
        # 0 < k < 10000 → pinyin parts; leading_unit: 10-19 read "shi ..".
        out: list[str] = []
        th, k2 = divmod(k, 1000)
        h, k3 = divmod(k2, 100)
        t, d = divmod(k3, 10)
        if th:
            out += [_DIGIT_PY[th], "qian"]
            if not h and (t or d):
                out.append("ling")
        if h:
            out += [_DIGIT_PY[h], "bai"]
            if not t and d:
                out.append("ling")
        if t:
            if t == 1 and not th and not h and leading_unit:
                out.append("shi")
            else:
                out += [_DIGIT_PY[t], "shi"]
        if d:
            out.append(_DIGIT_PY[d])
        return out

    groups: list[int] = []
    while n:
        n, g = divmod(n, 10000)
        groups.append(g)
    units = ["", "wan", "yi"]
    parts: list[str] = []
    for i in range(len(groups) - 1, -1, -1):
        g = groups[i]
        if not g:
            continue
        seg = four(g, leading_unit=(i == len(groups) - 1))
        if units[i]:
            seg.append(units[i])
        parts += seg
    if liang and parts == ["er"]:
        parts = ["liang"]
    return " ".join(parts)


# Measure words that prefer 两 for 2 and are common after numerals.
_MEASURES = {"个": "ge", "本": "ben", "只": "zhi", "条": "tiao", "张": "zhang",
             "件": "jian", "位": "wei", "名": "ming", "台": "tai", "辆": "liang",
             "杯": "bei", "瓶": "ping", "块": "kuai", "元": "yuan", "岁": "sui",
             "年": "nian", "月": "yue", "日": "ri", "号": "hao", "天": "tian",
             "次": "ci", "遍": "bian", "种": "zhong", "点": "dian", "分": "fen",
             "秒": "miao", "小时": "xiao shi", "分钟": "fen zhong"}


# ---------------------------------------------------------------------------
# Word lexicon (polyphonic-character disambiguation + high-frequency words)
# ---------------------------------------------------------------------------
# Values are space-separated toneless pinyin. Single-char defaults live in
# PINYIN below; entries here override them in context via the Viterbi cost.

WORDS: dict[str, str] = {
    # 的/地/得 — de as particles (default 的 de already), 得 dei in 得去
    "目的": "mu di", "的确": "di que", "打的": "da di",
    "土地": "tu di", "地方": "di fang", "地球": "di qiu", "地图": "di tu",
    "地铁": "di tie", "地址": "di zhi", "地区": "di qu", "地面": "di mian",
    "获得": "huo de", "觉得": "jue de", "记得": "ji de", "值得": "zhi de",
    "得到": "de dao",
    # 行 xing/hang
    "银行": "yin hang", "行业": "hang ye", "一行": "yi hang", "行列": "hang lie",
    "自行车": "zi xing che", "旅行": "lv xing", "行为": "xing wei",
    "进行": "jin xing", "流行": "liu xing", "行动": "xing dong",
    # 长 chang/zhang
    "长大": "zhang da", "校长": "xiao zhang", "长辈": "zhang bei",
    "成长": "cheng zhang", "队长": "dui zhang", "市长": "shi zhang",
    "长城": "chang cheng", "长江": "chang jiang", "长期": "chang qi",
    "很长": "hen chang", "长度": "chang du",
    # 重 zhong/chong
    "重要": "zhong yao", "重量": "zhong liang", "严重": "yan zhong",
    "重复": "chong fu", "重新": "chong xin",
    # 乐 le/yue
    "音乐": "yin yue", "乐器": "yue qi", "快乐": "kuai le", "乐观": "le guan",
    # 都 dou/du
    "首都": "shou du", "都市": "du shi", "成都": "cheng du",
    # 会 hui (kuai in 会计)
    "会计": "kuai ji",
    # 发 fa/fa4 (same toneless), 头发 fa
    "头发": "tou fa", "发现": "fa xian", "发展": "fa zhan",
    # 还 hai/huan
    "还有": "hai you", "还是": "hai shi", "还钱": "huan qian",
    "归还": "gui huan",
    # 着 zhe/zhao/zhuo
    "着急": "zhao ji", "穿着": "chuan zhe", "睡着": "shui zhao",
    # 觉 jue/jiao
    "睡觉": "shui jiao", "感觉": "gan jue", "觉得": "jue de",
    # 教 jiao/jiao4
    "教育": "jiao yu", "教师": "jiao shi", "教室": "jiao shi", "教学": "jiao xue",
    # 为 wei/wei4
    "因为": "yin wei", "为了": "wei le", "为什么": "wei shen me",
    "认为": "ren wei", "成为": "cheng wei", "行为": "xing wei",
    # 好 hao/hao4
    "爱好": "ai hao", "好奇": "hao qi",
    # 少 shao/shao4
    "少年": "shao nian", "多少": "duo shao", "减少": "jian shao",
    # 几 ji/ji3
    "几乎": "ji hu", "茶几": "cha ji",
    # 干 gan/gan4
    "干净": "gan jing", "干部": "gan bu", "干活": "gan huo", "饼干": "bing gan",
    # 空 kong/kong4
    "天空": "tian kong", "空气": "kong qi", "空闲": "kong xian", "有空": "you kong",
    # 便 bian/pian
    "方便": "fang bian", "便宜": "pian yi", "顺便": "shun bian",
    # 参 can/shen
    "参加": "can jia", "参观": "can guan", "人参": "ren shen",
    # 差 cha/chai
    "差不多": "cha bu duo", "出差": "chu chai", "差别": "cha bie",
    # 假 jia/jia4
    "假期": "jia qi", "放假": "fang jia", "假如": "jia ru",
    # 间 jian/jian4
    "时间": "shi jian", "房间": "fang jian", "中间": "zhong jian",
    # 应 ying/ying4
    "应该": "ying gai", "应用": "ying yong",
    # 相 xiang/xiang4
    "相信": "xiang xin", "互相": "hu xiang", "照相": "zhao xiang",
    # 转 zhuan/zhuan4
    "转变": "zhuan bian", "旋转": "xuan zhuan",
    # 藏 cang/zang
    "西藏": "xi zang", "躲藏": "duo cang",
    # 弹 dan/tan
    "子弹": "zi dan", "弹琴": "tan qin",
    # 调 diao/tiao
    "调查": "diao cha", "调整": "tiao zheng", "空调": "kong tiao",
    # 数 shu/shu3
    "数学": "shu xue", "数字": "shu zi", "数量": "shu liang",
    # 切 qie/qie4
    "一切": "yi qie", "亲切": "qin qie",
    # 更 geng/geng4
    "更加": "geng jia", "更好": "geng hao", "更新": "geng xin",
    # 传 chuan/zhuan
    "传统": "chuan tong", "传说": "chuan shuo", "自传": "zi zhuan",
    # 模 mo/mu
    "模型": "mo xing", "模样": "mu yang",
    # 薄 bao/bo
    "薄弱": "bo ruo",
    # 血 xue/xie
    "血液": "xue ye", "流血": "liu xie",
    # high-frequency multi-char function words (cheap Viterbi wins)
    "我们": "wo men", "你们": "ni men", "他们": "ta men", "她们": "ta men",
    "什么": "shen me", "怎么": "zen me", "这么": "zhe me", "那么": "na me",
    "没有": "mei you", "可以": "ke yi", "知道": "zhi dao", "现在": "xian zai",
    "今天": "jin tian", "明天": "ming tian", "昨天": "zuo tian",
    "中国": "zhong guo", "中文": "zhong wen", "普通话": "pu tong hua",
    "北京": "bei jing", "上海": "shang hai", "谢谢": "xie xie",
    "朋友": "peng you", "老师": "lao shi", "学生": "xue sheng",
    "学习": "xue xi", "工作": "gong zuo", "时候": "shi hou",
    "喜欢": "xi huan", "非常": "fei chang", "已经": "yi jing",
    "电脑": "dian nao", "电话": "dian hua", "电影": "dian ying",
    "汉语": "han yu", "英语": "ying yu", "世界": "shi jie",
    "大家": "da jia", "东西": "dong xi", "先生": "xian sheng",
    "小姐": "xiao jie", "孩子": "hai zi", "早上": "zao shang",
    "晚上": "wan shang", "中午": "zhong wu", "再见": "zai jian",
    "出租车": "chu zu che", "飞机": "fei ji", "火车": "huo che",
    "自己": "zi ji", "问题": "wen ti", "开始": "kai shi",
    "认识": "ren shi", "高兴": "gao xing", "漂亮": "piao liang",
    "便利店": "bian li dian",
}

# ---------------------------------------------------------------------------
# Single-character pinyin (frequency-ranked core, toneless; v = ü)
# ---------------------------------------------------------------------------

PINYIN: dict[str, str] = {
    "的": "de", "一": "yi", "是": "shi", "了": "le", "我": "wo", "不": "bu",
    "在": "zai", "人": "ren", "们": "men", "有": "you", "来": "lai",
    "他": "ta", "这": "zhe", "上": "shang", "着": "zhe", "个": "ge",
    "地": "de", "到": "dao", "大": "da", "里": "li", "说": "shuo",
    "就": "jiu", "去": "qu", "子": "zi", "得": "de", "也": "ye", "和": "he",
    "那": "na", "要": "yao", "下": "xia", "看": "kan", "天": "tian",
    "时": "shi", "过": "guo", "出": "chu", "小": "xiao", "么": "me",
    "起": "qi", "你": "ni", "都": "dou", "把": "ba", "好": "hao",
    "还": "hai", "多": "duo", "没": "mei", "为": "wei", "又": "you",
    "可": "ke", "家": "jia", "学": "xue", "只": "zhi", "以": "yi",
    "主": "zhu", "会": "hui", "样": "yang", "年": "nian", "想": "xiang",
    "生": "sheng", "同": "tong", "老": "lao", "中": "zhong", "十": "shi",
    "从": "cong", "自": "zi", "面": "mian", "前": "qian", "头": "tou",
    "道": "dao", "它": "ta", "后": "hou", "然": "ran", "走": "zou",
    "很": "hen", "像": "xiang", "见": "jian", "两": "liang", "用": "yong",
    "她": "ta", "国": "guo", "动": "dong", "进": "jin", "成": "cheng",
    "回": "hui", "什": "shen", "边": "bian", "作": "zuo", "对": "dui",
    "开": "kai", "而": "er", "己": "ji", "些": "xie", "现": "xian",
    "山": "shan", "民": "min", "候": "hou", "经": "jing", "发": "fa",
    "工": "gong", "向": "xiang", "事": "shi", "命": "ming", "给": "gei",
    "长": "chang", "水": "shui", "几": "ji", "义": "yi", "三": "san",
    "声": "sheng", "于": "yu", "高": "gao", "手": "shou", "知": "zhi",
    "理": "li", "眼": "yan", "志": "zhi", "点": "dian", "心": "xin",
    "战": "zhan", "二": "er", "问": "wen", "但": "dan", "身": "shen",
    "方": "fang", "实": "shi", "吃": "chi", "做": "zuo", "叫": "jiao",
    "当": "dang", "住": "zhu", "听": "ting", "革": "ge", "打": "da",
    "呢": "ne", "真": "zhen", "全": "quan", "才": "cai", "四": "si",
    "已": "yi", "所": "suo", "敌": "di", "之": "zhi", "最": "zui",
    "光": "guang", "产": "chan", "情": "qing", "路": "lu", "分": "fen",
    "总": "zong", "条": "tiao", "白": "bai", "话": "hua", "东": "dong",
    "席": "xi", "次": "ci", "亲": "qin", "如": "ru", "被": "bei",
    "花": "hua", "口": "kou", "放": "fang", "儿": "er", "常": "chang",
    "气": "qi", "五": "wu", "第": "di", "使": "shi", "写": "xie",
    "军": "jun", "吧": "ba", "文": "wen", "运": "yun", "再": "zai",
    "果": "guo", "怎": "zen", "定": "ding", "许": "xu", "快": "kuai",
    "明": "ming", "行": "xing", "因": "yin", "别": "bie", "飞": "fei",
    "外": "wai", "树": "shu", "物": "wu", "活": "huo", "部": "bu",
    "门": "men", "无": "wu", "往": "wang", "船": "chuan", "望": "wang",
    "新": "xin", "带": "dai", "队": "dui", "先": "xian", "力": "li",
    "完": "wan", "却": "que", "站": "zhan", "代": "dai", "员": "yuan",
    "机": "ji", "更": "geng", "九": "jiu", "您": "nin", "每": "mei",
    "风": "feng", "级": "ji", "跟": "gen", "笑": "xiao", "啊": "a",
    "孩": "hai", "万": "wan", "少": "shao", "直": "zhi", "意": "yi",
    "夜": "ye", "比": "bi", "阶": "jie", "连": "lian", "车": "che",
    "重": "zhong", "便": "bian", "斗": "dou", "马": "ma", "哪": "na",
    "化": "hua", "太": "tai", "指": "zhi", "变": "bian", "社": "she",
    "似": "si", "士": "shi", "者": "zhe", "干": "gan", "石": "shi",
    "满": "man", "日": "ri", "决": "jue", "百": "bai", "原": "yuan",
    "拿": "na", "群": "qun", "究": "jiu", "各": "ge", "六": "liu",
    "本": "ben", "思": "si", "解": "jie", "立": "li", "河": "he",
    "村": "cun", "八": "ba", "难": "nan", "早": "zao", "论": "lun",
    "吗": "ma", "根": "gen", "共": "gong", "让": "rang", "相": "xiang",
    "研": "yan", "今": "jin", "其": "qi", "题": "ti", "省": "sheng",
    "听": "ting", "样": "yang", "与": "yu", "皮": "pi", "边": "bian",
    "教": "jiao", "正": "zheng", "笔": "bi", "战": "zhan", "声": "sheng",
    "七": "qi", "近": "jin", "信": "xin", "脸": "lian", "句": "ju",
    "山": "shan", "字": "zi", "间": "jian", "片": "pian", "爱": "ai",
    "老": "lao", "因": "yin", "房": "fang", "音": "yin", "火": "huo",
    "介": "jie", "再": "zai", "做": "zuo", "觉": "jue", "轻": "qing",
    "张": "zhang", "吃": "chi", "友": "you", "求": "qiu", "毛": "mao",
    "具": "ju", "妈": "ma", "受": "shou", "挥": "hui", "名": "ming",
    "红": "hong", "快": "kuai", "场": "chang", "青": "qing", "领": "ling",
    "确": "que", "传": "chuan", "海": "hai", "色": "se", "金": "jin",
    "接": "jie", "校": "xiao", "爱": "ai", "元": "yuan", "肯": "ken",
    "练": "lian", "远": "yuan", "钱": "qian", "吧": "ba", "吹": "chui",
    "乐": "le", "含": "han", "坐": "zuo", "应": "ying", "低": "di",
    "收": "shou", "财": "cai", "由": "you", "达": "da", "冷": "leng",
    "哥": "ge", "弟": "di", "姐": "jie", "妹": "mei", "爸": "ba",
    "妇": "fu", "食": "shi", "送": "song", "切": "qie", "星": "xing",
    "晚": "wan", "错": "cuo", "买": "mai", "卖": "mai", "午": "wu",
    "读": "du", "写": "xie", "书": "shu", "语": "yu", "词": "ci",
    "汉": "han", "英": "ying", "法": "fa", "德": "de", "美": "mei",
    "俄": "e", "意": "yi", "服": "fu", "衣": "yi", "穿": "chuan",
    "鞋": "xie", "帽": "mao", "裤": "ku", "杯": "bei", "茶": "cha",
    "酒": "jiu", "饭": "fan", "菜": "cai", "肉": "rou", "鱼": "yu",
    "蛋": "dan", "奶": "nai", "糖": "tang", "盐": "yan", "水": "shui",
    "果": "guo", "苹": "ping", "香": "xiang", "蕉": "jiao", "梨": "li",
    "桃": "tao", "瓜": "gua", "米": "mi", "面": "mian", "包": "bao",
    "汤": "tang", "喝": "he", "渴": "ke", "饿": "e", "饱": "bao",
    "猫": "mao", "狗": "gou", "鸟": "niao", "鸡": "ji", "猪": "zhu",
    "羊": "yang", "牛": "niu", "虎": "hu", "兔": "tu", "龙": "long",
    "蛇": "she", "猴": "hou", "熊": "xiong", "象": "xiang", "鹿": "lu",
    "狼": "lang", "虫": "chong", "草": "cao", "叶": "ye", "林": "lin",
    "森": "sen", "花": "hua", "树": "shu", "根": "gen", "种": "zhong",
    "春": "chun", "夏": "xia", "秋": "qiu", "冬": "dong", "季": "ji",
    "节": "jie", "假": "jia", "雨": "yu", "雪": "xue", "云": "yun",
    "雷": "lei", "电": "dian", "风": "feng", "冰": "bing", "热": "re",
    "温": "wen", "凉": "liang", "晴": "qing", "阴": "yin", "月": "yue",
    "星": "xing", "空": "kong", "阳": "yang", "田": "tian",
    "土": "tu", "岩": "yan", "沙": "sha", "湖": "hu", "江": "jiang",
    "池": "chi", "井": "jing", "泉": "quan", "波": "bo", "浪": "lang",
    "岛": "dao", "岸": "an", "桥": "qiao", "街": "jie", "城": "cheng",
    "市": "shi", "县": "xian", "区": "qu", "镇": "zhen", "乡": "xiang",
    "州": "zhou", "京": "jing", "港": "gang", "台": "tai",
    "楼": "lou", "层": "ceng", "房": "fang", "屋": "wu", "室": "shi",
    "厅": "ting", "厨": "chu", "厕": "ce", "窗": "chuang", "床": "chuang",
    "桌": "zhuo", "椅": "yi", "灯": "deng", "门": "men", "墙": "qiang",
    "院": "yuan", "园": "yuan", "店": "dian", "馆": "guan", "厂": "chang",
    "场": "chang", "站": "zhan", "局": "ju", "所": "suo", "医": "yi",
    "药": "yao", "病": "bing", "疼": "teng", "痛": "tong", "伤": "shang",
    "治": "zhi", "健": "jian", "康": "kang", "体": "ti", "身": "shen",
    "头": "tou", "脑": "nao", "眼": "yan", "耳": "er", "鼻": "bi",
    "嘴": "zui", "牙": "ya", "舌": "she", "脖": "bo", "肩": "jian",
    "背": "bei", "胸": "xiong", "肚": "du", "腿": "tui", "脚": "jiao",
    "指": "zhi", "血": "xue", "骨": "gu", "肤": "fu", "汗": "han",
    "泪": "lei", "梦": "meng", "睡": "shui", "醒": "xing", "休": "xiu",
    "息": "xi", "累": "lei", "忙": "mang", "闲": "xian", "静": "jing",
    "闹": "nao", "吵": "chao", "安": "an", "危": "wei", "险": "xian",
    "全": "quan", "保": "bao", "护": "hu", "救": "jiu", "帮": "bang",
    "助": "zhu", "谢": "xie", "请": "qing", "问": "wen", "答": "da",
    "告": "gao", "诉": "su", "讲": "jiang", "谈": "tan", "议": "yi",
    "论": "lun", "评": "ping", "批": "pi", "夸": "kua", "骂": "ma",
    "哭": "ku", "喊": "han", "唱": "chang", "歌": "ge", "舞": "wu",
    "跳": "tiao", "跑": "pao", "爬": "pa", "游": "you", "泳": "yong",
    "踢": "ti", "球": "qiu", "赛": "sai", "赢": "ying", "输": "shu",
    "玩": "wan", "棋": "qi", "画": "hua", "图": "tu", "照": "zhao",
    "拍": "pai", "摄": "she", "影": "ying", "视": "shi", "播": "bo",
    "闻": "wen", "报": "bao", "纸": "zhi", "刊": "kan", "志": "zhi",
    "版": "ban", "印": "yin", "刷": "shua", "剧": "ju", "戏": "xi",
    "演": "yan", "奏": "zou", "琴": "qin", "鼓": "gu", "号": "hao",
    "曲": "qu", "调": "diao", "韵": "yun", "诗": "shi", "歌": "ge",
    "史": "shi", "古": "gu", "旧": "jiu", "新": "xin", "久": "jiu",
    "永": "yong", "暂": "zan", "短": "duan", "延": "yan", "迟": "chi",
    "早": "zao", "晨": "chen", "夜": "ye", "晚": "wan", "昨": "zuo",
    "明": "ming", "周": "zhou", "末": "mo", "初": "chu", "终": "zhong",
    "始": "shi", "段": "duan", "程": "cheng", "途": "tu", "旅": "lv",
    "游": "you", "玩": "wan", "票": "piao", "证": "zheng", "卡": "ka",
    "银": "yin", "币": "bi", "付": "fu", "费": "fei", "价": "jia",
    "贵": "gui", "宜": "yi", "租": "zu", "借": "jie", "换": "huan",
    "存": "cun", "取": "qu", "送": "song", "递": "di", "邮": "you",
    "寄": "ji", "收": "shou", "发": "fa", "传": "chuan", "递": "di",
    "网": "wang", "线": "xian", "号": "hao", "码": "ma", "键": "jian",
    "屏": "ping", "幕": "mu", "机": "ji", "器": "qi", "修": "xiu",
    "坏": "huai", "换": "huan", "装": "zhuang", "卸": "xie", "试": "shi",
    "验": "yan", "查": "cha", "检": "jian", "测": "ce", "算": "suan",
    "计": "ji", "数": "shu", "量": "liang", "称": "cheng", "秤": "cheng",
    "尺": "chi", "寸": "cun", "米": "mi", "克": "ke", "斤": "jin",
    "吨": "dun", "升": "sheng", "加": "jia", "减": "jian", "乘": "cheng",
    "除": "chu", "等": "deng", "零": "ling", "半": "ban", "双": "shuang",
    "对": "dui", "单": "dan", "偶": "ou", "奇": "qi", "整": "zheng",
    "余": "yu", "倍": "bei", "率": "lv", "比": "bi", "均": "jun",
    "概": "gai", "约": "yue", "估": "gu", "准": "zhun", "精": "jing",
    "细": "xi", "粗": "cu", "宽": "kuan", "窄": "zhai", "厚": "hou",
    "薄": "bao", "深": "shen", "浅": "qian", "高": "gao", "矮": "ai",
    "胖": "pang", "瘦": "shou", "壮": "zhuang", "弱": "ruo", "强": "qiang",
    "硬": "ying", "软": "ruan", "紧": "jin", "松": "song", "密": "mi",
    "疏": "shu", "满": "man", "空": "kong", "虚": "xu", "实": "shi",
    "真": "zhen", "假": "jia", "对": "dui", "错": "cuo", "正": "zheng",
    "反": "fan", "好": "hao", "坏": "huai", "美": "mei", "丑": "chou",
    "善": "shan", "恶": "e", "净": "jing", "脏": "zang", "亮": "liang",
    "暗": "an", "黑": "hei", "白": "bai", "红": "hong", "黄": "huang",
    "蓝": "lan", "绿": "lv", "紫": "zi", "灰": "hui", "粉": "fen",
    "棕": "zong", "橙": "cheng", "彩": "cai", "颜": "yan", "色": "se",
    "形": "xing", "状": "zhuang", "圆": "yuan", "方": "fang", "角": "jiao",
    "尖": "jian", "平": "ping", "弯": "wan", "曲": "qu", "斜": "xie",
    "横": "heng", "竖": "shu", "左": "zuo", "右": "you", "东": "dong",
    "南": "nan", "西": "xi", "北": "bei", "内": "nei", "外": "wai",
    "旁": "pang", "邻": "lin", "隔": "ge", "距": "ju", "离": "li",
    "环": "huan", "绕": "rao", "围": "wei", "转": "zhuan", "移": "yi",
    "挪": "nuo", "搬": "ban", "运": "yun", "载": "zai", "托": "tuo",
    "抬": "tai", "举": "ju", "提": "ti", "拉": "la", "推": "tui",
    "拖": "tuo", "抱": "bao", "背": "bei", "扛": "kang", "挑": "tiao",
    "担": "dan", "扔": "reng", "丢": "diu", "抛": "pao", "接": "jie",
    "捡": "jian", "拾": "shi", "抓": "zhua", "握": "wo", "捏": "nie",
    "摸": "mo", "碰": "peng", "撞": "zhuang", "敲": "qiao", "拍": "pai",
    "击": "ji", "踩": "cai", "踏": "ta", "蹬": "deng", "登": "deng",
    "爬": "pa", "滚": "gun", "滑": "hua", "摔": "shuai", "跌": "die",
    "倒": "dao", "立": "li", "站": "zhan", "蹲": "dun", "躺": "tang",
    "趴": "pa", "靠": "kao", "倚": "yi", "蹦": "beng", "跃": "yue",
    "冲": "chong", "奔": "ben", "追": "zhui", "赶": "gan", "逃": "tao",
    "躲": "duo", "藏": "cang", "寻": "xun", "找": "zhao", "搜": "sou",
    "失": "shi", "丢": "diu", "获": "huo", "留": "liu", "剩": "sheng",
    "余": "yu", "缺": "que", "补": "bu", "添": "tian", "增": "zeng",
    "减": "jian", "除": "chu", "消": "xiao", "灭": "mie", "毁": "hui",
    "坏": "huai", "破": "po", "裂": "lie", "碎": "sui", "断": "duan",
    "折": "zhe", "弯": "wan", "扭": "niu", "拧": "ning", "撕": "si",
    "剪": "jian", "切": "qie", "割": "ge", "砍": "kan", "劈": "pi",
    "锯": "ju", "钻": "zuan", "挖": "wa", "埋": "mai", "填": "tian",
    "盖": "gai", "遮": "zhe", "盖": "gai", "包": "bao", "裹": "guo",
    "捆": "kun", "绑": "bang", "系": "xi", "解": "jie", "开": "kai",
    "关": "guan", "锁": "suo", "封": "feng", "贴": "tie", "粘": "zhan",
    "挂": "gua", "吊": "diao", "钉": "ding", "插": "cha", "拔": "ba",
    "塞": "sai", "灌": "guan", "倒": "dao", "洒": "sa", "泼": "po",
    "滴": "di", "流": "liu", "淌": "tang", "渗": "shen", "漏": "lou",
    "涨": "zhang", "退": "tui", "淹": "yan", "浮": "fu", "沉": "chen",
    "漂": "piao", "洗": "xi", "刷": "shua", "擦": "ca", "抹": "mo",
    "扫": "sao", "拖": "tuo", "晾": "liang", "晒": "shai", "烤": "kao",
    "烧": "shao", "煮": "zhu", "蒸": "zheng", "炒": "chao", "炸": "zha",
    "煎": "jian", "炖": "dun", "拌": "ban", "切": "qie", "剥": "bao",
    "削": "xiao", "磨": "mo", "压": "ya", "榨": "zha", "挤": "ji",
    "捣": "dao", "搅": "jiao", "泡": "pao", "腌": "yan", "冻": "dong",
    "化": "hua", "融": "rong", "凝": "ning", "固": "gu", "液": "ye",
    "汽": "qi", "烟": "yan", "雾": "wu", "尘": "chen", "灰": "hui",
    "油": "you", "脂": "zhi", "蜡": "la", "胶": "jiao", "漆": "qi",
    "墨": "mo", "铁": "tie", "钢": "gang", "铜": "tong", "铝": "lv",
    "锡": "xi", "铅": "qian", "锌": "xin", "矿": "kuang", "煤": "mei",
    "炭": "tan", "玻": "bo", "璃": "li", "瓷": "ci", "陶": "tao",
    "砖": "zhuan", "瓦": "wa", "泥": "ni", "塑": "su", "料": "liao",
    "橡": "xiang", "棉": "mian", "麻": "ma", "丝": "si", "绸": "chou",
    "布": "bu", "皮": "pi", "革": "ge", "毛": "mao", "绒": "rong",
    "线": "xian", "绳": "sheng", "带": "dai", "链": "lian", "环": "huan",
    "圈": "quan", "网": "wang", "袋": "dai", "箱": "xiang", "盒": "he",
    "桶": "tong", "罐": "guan", "瓶": "ping", "壶": "hu", "碗": "wan",
    "盘": "pan", "碟": "die", "勺": "shao", "筷": "kuai", "叉": "cha",
    "刀": "dao", "锅": "guo", "炉": "lu", "灶": "zao", "柜": "gui",
    "架": "jia", "箱": "xiang", "篮": "lan", "筐": "kuang", "梯": "ti",
    "凳": "deng", "镜": "jing", "梳": "shu", "刷": "shua", "巾": "jin",
    "伞": "san", "扇": "shan", "钟": "zhong", "表": "biao", "针": "zhen",
    "剪": "jian", "尺": "chi", "笔": "bi", "墨": "mo", "纸": "zhi",
    "砚": "yan", "橡": "xiang", "胶": "jiao", "夹": "jia", "订": "ding",
    "册": "ce", "页": "ye", "章": "zhang", "节": "jie", "篇": "pian",
    "段": "duan", "句": "ju", "词": "ci", "字": "zi", "母": "mu",
    "拼": "pin", "读": "du", "念": "nian", "背": "bei", "默": "mo",
    "抄": "chao", "译": "yi", "注": "zhu", "释": "shi", "义": "yi",
    "培": "pei", "训": "xun", "考": "kao", "测": "ce", "卷": "juan",
    "题": "ti", "答": "da", "案": "an", "析": "xi", "探": "tan",
    "索": "suo", "创": "chuang", "造": "zao", "设": "she", "制": "zhi",
    "做": "zuo", "建": "jian", "筑": "zhu",
    # supplement: common characters missed by the first pass
    "公": "gong", "散": "san", "步": "bu", "历": "li", "欢": "huan",
    "迎": "ying", "习": "xi", "记": "ji", "忆": "yi", "忘": "wang",
    "念": "nian", "感": "gan", "恩": "en", "愿": "yuan", "希": "xi",
    "盼": "pan", "期": "qi", "待": "dai", "预": "yu", "或": "huo",
    "若": "ruo", "虽": "sui", "且": "qie", "并": "bing", "则": "ze",
    "即": "ji", "既": "ji", "必": "bi", "须": "xu", "需": "xu",
    "能": "neng", "该": "gai", "敢": "gan", "肯": "ken", "懂": "dong",
    "记": "ji", "识": "shi", "智": "zhi", "慧": "hui", "聪": "cong",
    "谁": "shei", "某": "mou", "每": "mei", "任": "ren", "凡": "fan",
    "另": "ling", "其": "qi", "彼": "bi", "此": "ci", "互": "hu",
    "术": "shu", "科": "ke", "究": "jiu", "察": "cha", "观": "guan",
    "览": "lan", "显": "xian", "示": "shi", "表": "biao", "达": "da",
    "述": "shu", "描": "miao", "绘": "hui", "记": "ji", "录": "lu",
    "载": "zai", "编": "bian", "排": "pai", "列": "lie", "序": "xu",
    "组": "zu", "织": "zhi", "构": "gou", "系": "xi", "统": "tong",
    "规": "gui", "则": "ze", "律": "lv", "例": "li", "式": "shi",
    "型": "xing", "类": "lei", "款": "kuan", "项": "xiang", "품": "",
    "任": "ren", "务": "wu", "责": "ze", "职": "zhi", "权": "quan",
    "利": "li", "益": "yi", "损": "sun", "害": "hai", "罚": "fa",
    "奖": "jiang", "赏": "shang", "励": "li", "努": "nu", "勤": "qin",
    "懒": "lan", "勇": "yong", "怕": "pa", "惊": "jing", "恐": "kong",
    "慌": "huang", "忧": "you", "愁": "chou", "烦": "fan", "怒": "nu",
    "恨": "hen", "怨": "yuan", "悔": "hui", "惜": "xi", "怜": "lian",
    "慕": "mu", "羡": "xian", "嫉": "ji", "妒": "du", "骄": "jiao",
    "傲": "ao", "谦": "qian", "诚": "cheng", "谎": "huang", "骗": "pian",
    "偷": "tou", "抢": "qiang", "盗": "dao", "罪": "zui", "犯": "fan",
    "警": "jing", "捕": "bu", "审": "shen", "判": "pan", "狱": "yu",
    "政": "zheng", "府": "fu", "党": "dang", "委": "wei", "官": "guan",
    "职": "zhi", "选": "xuan", "举": "ju", "投": "tou", "税": "shui",
    "贸": "mao", "易": "yi", "购": "gou", "销": "xiao", "售": "shou",
    "货": "huo", "商": "shang", "业": "ye", "企": "qi", "司": "si",
    "厂": "chang", "营": "ying", "管": "guan", "雇": "gu", "聘": "pin",
    "薪": "xin", "酬": "chou", "奖": "jiang", "金": "jin", "富": "fu",
    "穷": "qiong", "贫": "pin", "债": "zhai", "赚": "zhuan", "赔": "pei",
    "亏": "kui", "盈": "ying", "婚": "hun", "嫁": "jia", "娶": "qu",
    "妻": "qi", "夫": "fu", "儿": "er", "女": "nv", "孙": "sun",
    "祖": "zu", "宗": "zong", "族": "zu", "戚": "qi", "邻": "lin",
    "居": "ju", "客": "ke", "宾": "bin", "主": "zhu", "仆": "pu",
    "宣": "xuan", "济": "ji", "策": "ce", "府": "fu", "效": "xiao",
    "验": "yan", "境": "jing", "况": "kuang", "величина": "",
    "态": "tai", "势": "shi", "局": "ju", "景": "jing", "象": "xiang",
    "征": "zheng", "兆": "zhao", "亿": "yi", "兼": "jian", "较": "jiao",
    "超": "chao", "越": "yue", "限": "xian", "制": "zhi", "止": "zhi",
    "禁": "jin", "允": "yun", "批": "pi", "准": "zhun", "证": "zheng",
    "据": "ju", "依": "yi", "按": "an", "照": "zhao", "据": "ju",
}
for _bad2 in ("величина", ""):
    PINYIN.pop(_bad2, None)
for _bad in ("품", ""):
    PINYIN.pop(_bad, None)

_HAN_RE = re.compile(r"[㐀-鿿豈-﫿]")
_warned_hanzi: set[str] = set()
_warned_yue = [False]


def _is_hanzi(ch: str) -> bool:
    return bool(_HAN_RE.match(ch))


_LEX_BY_FIRST: dict[str, list[str]] = {}
for _w in sorted(WORDS, key=len, reverse=True):
    _LEX_BY_FIRST.setdefault(_w[0], []).append(_w)


def _read_number_at(text: str, i: int) -> tuple[str, int] | None:
    m = re.match(r"\d+", text[i:])
    if not m:
        return None
    digits = m.group(0)
    j = i + len(digits)
    # Multi-char measures first.
    for mw, mpy in _MEASURES.items():
        if len(mw) > 1 and text.startswith(mw, j):
            return number_to_pinyin(int(digits), liang=True) + " " + mpy, j + len(mw)
    nxt = text[j] if j < len(text) else ""
    if nxt in _MEASURES and len(nxt) == 1:
        return (
            number_to_pinyin(int(digits), liang=(nxt not in "年月日号"))
            + " " + _MEASURES[nxt],
            j + 1,
        )
    return number_to_pinyin(int(digits)), j


def read_chinese(text: str, language: str = "cmn") -> str:
    """hanzi/numeral text → toneless pinyin string (space-separated).

    Viterbi segmentation over WORDS + single-char PINYIN (same lattice
    design as conditioning/ja.py::_segment); unknown hanzi are dropped with
    one loud warning per character.
    """
    if language.startswith("yue") and not _warned_yue[0]:
        _warned_yue[0] = True
        logger.warning(
            "Cantonese (yue) has no native reading table: reading hanzi with "
            "MANDARIN readings — install espeak-ng for true Cantonese"
        )
    n = len(text)
    COST_WORD_BASE = 9.0
    COST_CHAR = 6.0
    COST_NUM = 3.0
    COST_OTHER = 2.0
    COST_DROP = 100.0

    INF = float("inf")
    best = [INF] * (n + 1)
    back: list[tuple[int, str, str] | None] = [None] * (n + 1)
    best[0] = 0.0
    for i in range(n):
        if best[i] == INF:
            continue
        ch = text[i]
        num = _read_number_at(text, i)
        if num is not None:
            reading, j = num
            c = best[i] + COST_NUM
            if c < best[j]:
                best[j], back[j] = c, (i, reading, "num")
        for w in _LEX_BY_FIRST.get(ch, ()):
            if text.startswith(w, i):
                j = i + len(w)
                c = best[i] + max(COST_WORD_BASE - 2.0 * len(w), 1.0)
                if c < best[j]:
                    best[j], back[j] = c, (i, WORDS[w], "word")
        if _is_hanzi(ch):
            py = PINYIN.get(ch)
            if py is not None:
                c = best[i] + COST_CHAR
                if c < best[i + 1]:
                    best[i + 1], back[i + 1] = c, (i, py, "char")
            c = best[i] + COST_DROP
            if c < best[i + 1]:
                best[i + 1], back[i + 1] = c, (i, "", "drop")
        else:
            _PUNCT = {"。": ".", "．": ".", "，": ",", "、": ",", "！": "!",
                      "？": "?", "：": ":", "；": ";", "「": '"', "」": '"',
                      "『": '"', "』": '"', "（": "(", "）": ")", "《": '"',
                      "》": '"', "　": " "}
            c = best[i] + COST_OTHER
            if c < best[i + 1]:
                best[i + 1], back[i + 1] = c, (i, _PUNCT.get(ch, ch), "other")

    pieces: list[tuple[str, str, str]] = []
    j = n
    while j > 0:
        prev, reading, kind = back[j]  # type: ignore[misc]
        pieces.append((reading, kind, text[prev:j]))
        j = prev
    pieces.reverse()

    out: list[str] = []
    for reading, kind, surface in pieces:
        if kind == "drop":
            if surface not in _warned_hanzi:
                _warned_hanzi.add(surface)
                logger.warning(
                    "Chinese fallback: no reading for hanzi %r — dropped "
                    "(install espeak-ng for full coverage)", surface,
                )
            continue
        if kind in ("word", "char", "num"):
            if out and out[-1] and not out[-1].endswith(" "):
                out.append(" ")
            out.append(reading)
        else:
            out.append(reading)
    return "".join(out).strip()


def chinese_to_ipa(text: str, language: str = "cmn") -> str:
    """hanzi text → IPA via pinyin (tones dropped)."""
    py = read_chinese(text, language)
    out: list[str] = []
    for token in re.split(r"(\s+|[;:,.!?()\"-])", py):
        if not token:
            continue
        if re.fullmatch(r"[a-zv]+", token):
            out.append(pinyin_to_ipa(token))
        else:
            out.append(" " if token.isspace() else token)
    return "".join(out)


def coverage(text: str) -> float:
    """Fraction of hanzi receiving a reading."""
    total = sum(1 for ch in text if _is_hanzi(ch))
    if total == 0:
        return 1.0
    covered = sum(
        1 for ch in text if _is_hanzi(ch)
        and (ch in PINYIN or any(ch in w for w in WORDS))
    )
    return covered / total
