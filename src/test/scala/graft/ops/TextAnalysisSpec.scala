package graft.ops

import org.scalatest.funsuite.AnyFunSuite

class TextAnalysisSpec extends AnyFunSuite {

  test("langId heuristic identifies major languages") {
    assert(TextAnalysis.langIdOf("the cat sat on the mat and it was happy") == "en")
    assert(TextAnalysis.langIdOf("le chat est sur la table et il est content") == "fr")
    assert(TextAnalysis.langIdOf("el gato es bonito y la casa es grande") == "es")
    assert(TextAnalysis.langIdOf("der Hund und die Katze sind nicht im Haus") == "de")
    assert(TextAnalysis.langIdOf("这是一个中文句子没有空格") == "zh")
    assert(TextAnalysis.langIdOf("это русское предложение для теста") == "ru")
    // kana share splits Japanese out of the Han bucket (typical prose mixes
    // kanji + kana); Hangul splits Korean
    assert(TextAnalysis.langIdOf("これは日本語の文章です。漢字とかなが混ざります。") == "ja")
    assert(TextAnalysis.langIdOf("日本語のテキストサンプル") == "ja")
    assert(TextAnalysis.langIdOf("이것은 한국어 문장입니다 테스트용") == "ko")
    assert(TextAnalysis.langIdOf("한국어 漢字 혼용 문장도 한국어로") == "ko")
    assert(TextAnalysis.langIdOf("") == "und")
    assert(TextAnalysis.langIdOf("12345 67890 !!!") == "und")
  }

  test("langId round-5 profiles: pt/it/nl/pl/tr/sv/vi/id") {
    assert(TextAnalysis.langIdOf(
      "as coisas não são uma surpresa mas foi como seu pai dizia com mais calma") == "pt")
    assert(TextAnalysis.langIdOf(
      "il libro che non sono riuscito a leggere è anche più bello di questo") == "it")
    assert(TextAnalysis.langIdOf(
      "het huis dat wij niet met een tuin voor deze prijs konden vinden") == "nl")
    assert(TextAnalysis.langIdOf(
      "nie wiem czy to jest tak dobre ale dla nas już tylko w ten sposób") == "pl")
    assert(TextAnalysis.langIdOf(
      "bu kitap bir hediye ve onun için daha çok zaman kadar bekledim") == "tr")
    assert(TextAnalysis.langIdOf(
      "det är en bok som jag inte har läst för att den är för lång") == "sv")
    assert(TextAnalysis.langIdOf(
      "đây là một cuốn sách mà tôi không có thời gian để đọc cho những người") == "vi")
    assert(TextAnalysis.langIdOf(
      "buku ini adalah hadiah yang tidak akan saya lupakan dari dalam hati") == "id")
    // romance-overlap guard: heavy shared articles still route to the
    // strongest profile, and ties break to the EARLIER (ordered) entry
    assert(TextAnalysis.langIdOf("la de un") == "fr") // fr before es on ties
  }

  test("rolling hashes are shift-consistent (Rabin-Karp property)") {
    val a = TextAnalysis.rollingHashes("abcdefghijklmnopqrstuvwxyz", 16)
    val b = TextAnalysis.rollingHashes("XYZabcdefghijklmnopqrstuvwxyz", 16)
    // window "defghijklmnopqrs" occurs in both at different offsets
    assert(a.toSet.intersect(b.toSet).nonEmpty)
    // deterministic
    assert(a.toSeq == TextAnalysis.rollingHashes("abcdefghijklmnopqrstuvwxyz", 16).toSeq)
  }

  test("winnowing picks stable fingerprints for shared passages") {
    val shared = "the quick brown fox jumps over the lazy dog again and again"
    val d1 = "AAAA " + shared + " BBBB"
    val d2 = "CCCCCC " + shared + " DD"
    val f1 = TextAnalysis.winnow(TextAnalysis.rollingHashes(d1, 16), 8).toSet
    val f2 = TextAnalysis.winnow(TextAnalysis.rollingHashes(d2, 16), 8).toSet
    val overlap = f1.intersect(f2).size.toDouble / math.min(f1.size, f2.size)
    assert(overlap > 0.4, s"shared-passage fingerprint overlap was $overlap")
    val unrelated = TextAnalysis.winnow(
      TextAnalysis.rollingHashes("zzz completely different content here entirely", 16), 8).toSet
    assert(f1.intersect(unrelated).isEmpty)
  }

  test("winnow handles short inputs") {
    assert(TextAnalysis.winnow(Array.empty[Long], 8).isEmpty)
    assert(TextAnalysis.winnow(Array(5L, 3L), 8).toSeq == Seq(3L))
    assert(TextAnalysis.rollingHashes("ab", 16).length == 1)
  }
}
