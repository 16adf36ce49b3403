package graft

import java.io.{BufferedWriter, FileOutputStream, OutputStreamWriter}
import java.util.zip.GZIPOutputStream

/** Writes the committed NER gazetteer model artifact
  * (src/main/resources/graft/ner_gazetteer.tsv.gz; format `label\tconf\tentity`).
  *
  * Deterministic composition — re-running reproduces the file byte-for-byte:
  *   PER: 80 family × 64 given kanji names, concatenated + spaced variants;
  *   ORG: stem × suffix company names (kanji + latin);
  *   LOC: all 47 prefectures + prefecture×district compounds.
  * Run deliberately via `sbt "Test/runMain graft.GenGazetteer"`, then review
  * the diff: the artifact defines model behavior (like regenerating goldens).
  */
object GenGazetteer {

  val families: Vector[String] = Vector(
    "山田", "田中", "佐藤", "鈴木", "高橋", "伊藤", "渡辺", "山本", "中村", "小林",
    "加藤", "吉田", "山口", "松本", "井上", "木村", "林", "斎藤", "清水", "山崎",
    "森", "阿部", "池田", "橋本", "石川", "前田", "藤田", "後藤", "近藤", "村上",
    "遠藤", "青木", "坂本", "斉藤", "福田", "太田", "西村", "藤井", "金子", "岡田",
    "藤原", "中島", "石井", "原田", "小川", "竹内", "中川", "岡本", "松田", "中野",
    "原", "小野", "田村", "竹田", "上田", "森田", "武田", "杉山", "増田", "小島",
    "平野", "大塚", "千葉", "久保", "松井", "岩崎", "桜井", "野口", "松尾", "野村",
    "菊地", "木下", "佐野", "大西", "杉本", "新井", "浜田", "菅原", "市川", "水野")

  val givens: Vector[String] = Vector(
    "太郎", "花子", "一郎", "美咲", "健太", "結衣", "大輔", "さくら", "翔太", "陽菜",
    "直樹", "愛", "拓也", "彩", "健一", "優子", "浩二", "恵美", "隆", "真由美",
    "誠", "久美子", "学", "幸子", "修", "和子", "勇", "典子", "豊", "智子",
    "茂", "裕子", "清", "京子", "進", "洋子", "博", "悦子", "勝", "節子",
    "宏", "文子", "正", "春子", "昇", "千代子", "実", "秋子", "徹", "冬子",
    "剛", "夏美", "潤", "遥", "亮", "葵", "蓮", "凛", "悠斗", "芽依",
    "湊", "紬", "樹", "莉子")

  val orgStems: Vector[String] = Vector(
    "山田", "田中", "佐藤", "東洋", "日邦", "大和", "旭", "協和", "三共", "北斗",
    "丸紅風", "青空", "白山", "若葉", "緑川", "泉", "富士見", "高原", "港", "中央",
    "平和", "光", "大成", "興和", "栄進", "明和", "豊田風", "桜", "椿", "菊水",
    "松風", "竹林", "梅田風", "千曲", "飛鳥", "曙", "昭栄", "瑞穂", "八雲", "常盤",
    "Hikari", "Sakura", "Aozora", "Wakaba", "Chuo", "Heiwa", "Eishin", "Mizuho",
    "Yakumo", "Tokiwa", "Asuka", "Akebono", "Hokuto", "Kyowa", "Taisei", "Kowa")

  val orgSuffixes: Vector[String] = Vector("株式会社", "商事", "工業", "電機", "物産")
  val latinSuffixes: Vector[String] = Vector("Corp", "KK", "Inc")

  val prefectures: Vector[String] = Vector(
    "北海道", "青森県", "岩手県", "宮城県", "秋田県", "山形県", "福島県",
    "茨城県", "栃木県", "群馬県", "埼玉県", "千葉県", "東京都", "神奈川県",
    "新潟県", "富山県", "石川県", "福井県", "山梨県", "長野県", "岐阜県",
    "静岡県", "愛知県", "三重県", "滋賀県", "京都府", "大阪府", "兵庫県",
    "奈良県", "和歌山県", "鳥取県", "島根県", "岡山県", "広島県", "山口県",
    "徳島県", "香川県", "愛媛県", "高知県", "福岡県", "佐賀県", "長崎県",
    "熊本県", "大分県", "宮崎県", "鹿児島県", "沖縄県")

  val districts: Vector[String] = Vector(
    "中央区", "北区", "南区", "東区", "西区", "港区", "緑区", "泉区",
    "旭区", "栄区", "青葉区", "若葉区", "川崎市", "堺市", "岡崎市",
    "松山市", "高田市", "大町", "本町", "栄町")

  def entries: Vector[(String, Double, String)] = {
    val per = for (f <- families; g <- givens; e <- Vector(f + g, f + " " + g))
      yield ("PER", 0.97, e)
    val orgJa = for (s <- orgStems; x <- orgSuffixes) yield ("ORG", 0.93, s + x)
    val orgLatin = for (s <- orgStems.filter(_.head < 'Ā'); x <- latinSuffixes)
      yield ("ORG", 0.93, s"$s $x")
    val orgExtra = Vector(("ORG", 0.93, "Example Corp"), ("ORG", 0.93, "Acme KK"))
    val loc = prefectures.map(p => ("LOC", 0.90, p)) ++
      (for (p <- prefectures; d <- districts) yield ("LOC", 0.90, p + d))
    val misc = Vector(("MISC", 0.60, "graft"))
    (per ++ orgJa ++ orgLatin ++ orgExtra ++ loc ++ misc)
      .distinctBy(_._3)
  }

  def main(args: Array[String]): Unit = {
    val path = "src/main/resources/graft/ner_gazetteer.tsv.gz"
    new java.io.File(path).getParentFile.mkdirs()
    val w = new BufferedWriter(new OutputStreamWriter(
      new GZIPOutputStream(new FileOutputStream(path)), "UTF-8"))
    val es = entries
    es.foreach { case (label, conf, e) => w.write(s"$label\t$conf\t$e\n") }
    w.close()
    println(s"wrote $path (${es.size} entries)")
  }
}
