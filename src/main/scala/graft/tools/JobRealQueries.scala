package graft.tools

/**
 * The 113-query JOB workload (Join Order Benchmark: Leis et al., "How
 * Good Are Query Optimizers, Really?", VLDB 2015 — the exact workload
 * the reference validates on, test_job_queries.sh:206-299), RECONSTRUCTED
 * from the published benchmark query set for the synthetic IMDB fixtures
 * of [[ImdbFixtures]].
 *
 * Fidelity notes:
 *  - The JOIN GRAPHS (FROM list + equi-join predicates) match the
 *    published queries family-for-family — the same 4–17-relation
 *    snowflakes around the `title` hub that [[graft.rpt.JobTopologies]]
 *    transcribes shape-only; relation counts per variant match the
 *    published FROM clauses.
 *  - Filter predicates follow the published forms (same columns, same
 *    operator shapes: dim equality/IN, LIKE on notes/names/titles,
 *    ranges on production_year and rating strings); constants are the
 *    published ones where recalled exactly, synthesized in the published
 *    style elsewhere. [[ImdbFixtures]] plants a small "hero" block so the
 *    tightest variants (e.g. 29a/29b: Shrek 2 ∧ Queen ∧ computer-
 *    animation ∧ voice actress) return rows on synthetic data.
 *  - All queries are the published SELECT MIN(...) global-aggregate
 *    form, expressed with the comma-join syntax of the originals (valid
 *    Spark SQL and DuckDB SQL).
 */
object JobRealQueries {

  val all: Seq[(String, String)] = Seq(
    // ---- family 1: t, mc->ct, mi_idx->it (5 relations) ----
    "1a" -> """
      SELECT MIN(mc.note) AS production_note, MIN(t.title) AS movie_title,
             MIN(t.production_year) AS movie_year
      FROM company_type AS ct, info_type AS it, movie_companies AS mc,
           movie_info_idx AS mi_idx, title AS t
      WHERE ct.kind = 'production companies' AND it.info = 'top 250 rank'
        AND mc.note NOT LIKE '%(as Metro-Goldwyn-Mayer Pictures)%'
        AND (mc.note LIKE '%(co-production)%' OR mc.note LIKE '%(presents)%')
        AND ct.id = mc.company_type_id AND t.id = mc.movie_id
        AND t.id = mi_idx.movie_id AND mc.movie_id = mi_idx.movie_id
        AND it.id = mi_idx.info_type_id""",
    "1b" -> """
      SELECT MIN(mc.note) AS production_note, MIN(t.title) AS movie_title,
             MIN(t.production_year) AS movie_year
      FROM company_type AS ct, info_type AS it, movie_companies AS mc,
           movie_info_idx AS mi_idx, title AS t
      WHERE ct.kind = 'production companies' AND it.info = 'bottom 10 rank'
        AND mc.note NOT LIKE '%(as Metro-Goldwyn-Mayer Pictures)%'
        AND t.production_year BETWEEN 2005 AND 2010
        AND ct.id = mc.company_type_id AND t.id = mc.movie_id
        AND t.id = mi_idx.movie_id AND mc.movie_id = mi_idx.movie_id
        AND it.id = mi_idx.info_type_id""",
    "1c" -> """
      SELECT MIN(mc.note) AS production_note, MIN(t.title) AS movie_title,
             MIN(t.production_year) AS movie_year
      FROM company_type AS ct, info_type AS it, movie_companies AS mc,
           movie_info_idx AS mi_idx, title AS t
      WHERE ct.kind = 'production companies' AND it.info = 'top 250 rank'
        AND mc.note NOT LIKE '%(as Metro-Goldwyn-Mayer Pictures)%'
        AND mc.note LIKE '%(co-production)%'
        AND t.production_year > 2010
        AND ct.id = mc.company_type_id AND t.id = mc.movie_id
        AND t.id = mi_idx.movie_id AND mc.movie_id = mi_idx.movie_id
        AND it.id = mi_idx.info_type_id""",
    "1d" -> """
      SELECT MIN(mc.note) AS production_note, MIN(t.title) AS movie_title,
             MIN(t.production_year) AS movie_year
      FROM company_type AS ct, info_type AS it, movie_companies AS mc,
           movie_info_idx AS mi_idx, title AS t
      WHERE ct.kind = 'production companies' AND it.info = 'bottom 10 rank'
        AND mc.note NOT LIKE '%(as Metro-Goldwyn-Mayer Pictures)%'
        AND t.production_year > 2000
        AND ct.id = mc.company_type_id AND t.id = mc.movie_id
        AND t.id = mi_idx.movie_id AND mc.movie_id = mi_idx.movie_id
        AND it.id = mi_idx.info_type_id""",

    // ---- family 2: t, mc->cn, mk->k (5) ----
    "2a" -> """
      SELECT MIN(t.title) AS movie_title
      FROM company_name AS cn, keyword AS k, movie_companies AS mc,
           movie_keyword AS mk, title AS t
      WHERE cn.country_code = '[de]' AND k.keyword = 'character-name-in-title'
        AND cn.id = mc.company_id AND mc.movie_id = t.id
        AND t.id = mk.movie_id AND mk.keyword_id = k.id
        AND mc.movie_id = mk.movie_id""",
    "2b" -> """
      SELECT MIN(t.title) AS movie_title
      FROM company_name AS cn, keyword AS k, movie_companies AS mc,
           movie_keyword AS mk, title AS t
      WHERE cn.country_code = '[nl]' AND k.keyword = 'character-name-in-title'
        AND cn.id = mc.company_id AND mc.movie_id = t.id
        AND t.id = mk.movie_id AND mk.keyword_id = k.id
        AND mc.movie_id = mk.movie_id""",
    "2c" -> """
      SELECT MIN(t.title) AS movie_title
      FROM company_name AS cn, keyword AS k, movie_companies AS mc,
           movie_keyword AS mk, title AS t
      WHERE cn.country_code = '[sm]' AND k.keyword = 'character-name-in-title'
        AND cn.id = mc.company_id AND mc.movie_id = t.id
        AND t.id = mk.movie_id AND mk.keyword_id = k.id
        AND mc.movie_id = mk.movie_id""",
    "2d" -> """
      SELECT MIN(t.title) AS movie_title
      FROM company_name AS cn, keyword AS k, movie_companies AS mc,
           movie_keyword AS mk, title AS t
      WHERE cn.country_code = '[us]' AND k.keyword = 'character-name-in-title'
        AND cn.id = mc.company_id AND mc.movie_id = t.id
        AND t.id = mk.movie_id AND mk.keyword_id = k.id
        AND mc.movie_id = mk.movie_id""",

    // ---- family 3: t, mk->k, mi (4) ----
    "3a" -> """
      SELECT MIN(t.title) AS movie_title
      FROM keyword AS k, movie_info AS mi, movie_keyword AS mk, title AS t
      WHERE k.keyword LIKE '%sequel%'
        AND mi.info IN ('Sweden','Norway','Germany','Denmark','Swedish',
                        'Denish','Norwegian','German')
        AND t.production_year > 2005
        AND t.id = mi.movie_id AND t.id = mk.movie_id
        AND mk.movie_id = mi.movie_id AND k.id = mk.keyword_id""",
    "3b" -> """
      SELECT MIN(t.title) AS movie_title
      FROM keyword AS k, movie_info AS mi, movie_keyword AS mk, title AS t
      WHERE k.keyword LIKE '%sequel%' AND mi.info IN ('Bulgaria')
        AND t.production_year > 2010
        AND t.id = mi.movie_id AND t.id = mk.movie_id
        AND mk.movie_id = mi.movie_id AND k.id = mk.keyword_id""",
    "3c" -> """
      SELECT MIN(t.title) AS movie_title
      FROM keyword AS k, movie_info AS mi, movie_keyword AS mk, title AS t
      WHERE k.keyword LIKE '%sequel%'
        AND mi.info IN ('Sweden','Norway','Germany','Denmark','Swedish',
                        'Denish','Norwegian','German','USA','American')
        AND t.production_year > 1990
        AND t.id = mi.movie_id AND t.id = mk.movie_id
        AND mk.movie_id = mi.movie_id AND k.id = mk.keyword_id""",

    // ---- family 4: t, mi_idx->it, mk->k (5) ----
    "4a" -> """
      SELECT MIN(mi_idx.info) AS rating, MIN(t.title) AS movie_title
      FROM info_type AS it, keyword AS k, movie_info_idx AS mi_idx,
           movie_keyword AS mk, title AS t
      WHERE it.info = 'rating' AND k.keyword LIKE '%sequel%'
        AND mi_idx.info > '5.0' AND t.production_year > 2005
        AND t.id = mi_idx.movie_id AND t.id = mk.movie_id
        AND mk.movie_id = mi_idx.movie_id AND k.id = mk.keyword_id
        AND it.id = mi_idx.info_type_id""",
    "4b" -> """
      SELECT MIN(mi_idx.info) AS rating, MIN(t.title) AS movie_title
      FROM info_type AS it, keyword AS k, movie_info_idx AS mi_idx,
           movie_keyword AS mk, title AS t
      WHERE it.info = 'rating' AND k.keyword LIKE '%sequel%'
        AND mi_idx.info > '9.0' AND t.production_year > 2010
        AND t.id = mi_idx.movie_id AND t.id = mk.movie_id
        AND mk.movie_id = mi_idx.movie_id AND k.id = mk.keyword_id
        AND it.id = mi_idx.info_type_id""",
    "4c" -> """
      SELECT MIN(mi_idx.info) AS rating, MIN(t.title) AS movie_title
      FROM info_type AS it, keyword AS k, movie_info_idx AS mi_idx,
           movie_keyword AS mk, title AS t
      WHERE it.info = 'rating' AND k.keyword LIKE '%sequel%'
        AND mi_idx.info > '2.0' AND t.production_year > 1990
        AND t.id = mi_idx.movie_id AND t.id = mk.movie_id
        AND mk.movie_id = mi_idx.movie_id AND k.id = mk.keyword_id
        AND it.id = mi_idx.info_type_id""",

    // ---- family 5: t, mc->ct, mi->it (5) ----
    "5a" -> """
      SELECT MIN(t.title) AS typical_european_movie
      FROM company_type AS ct, info_type AS it, movie_companies AS mc,
           movie_info AS mi, title AS t
      WHERE ct.kind = 'production companies'
        AND mc.note LIKE '%(theatrical)%' AND mc.note LIKE '%(France)%'
        AND mi.info IN ('Sweden','Norway','Germany','Denmark','Swedish',
                        'Denish','Norwegian','German')
        AND t.production_year > 2005
        AND t.id = mi.movie_id AND t.id = mc.movie_id
        AND mc.movie_id = mi.movie_id AND ct.id = mc.company_type_id
        AND it.id = mi.info_type_id""",
    "5b" -> """
      SELECT MIN(t.title) AS american_vhs_movie
      FROM company_type AS ct, info_type AS it, movie_companies AS mc,
           movie_info AS mi, title AS t
      WHERE ct.kind = 'production companies'
        AND mc.note LIKE '%(VHS)%' AND mc.note LIKE '%(USA)%'
        AND mc.note LIKE '%(1994)%'
        AND mi.info IN ('USA','America')
        AND t.production_year > 2010
        AND t.id = mi.movie_id AND t.id = mc.movie_id
        AND mc.movie_id = mi.movie_id AND ct.id = mc.company_type_id
        AND it.id = mi.info_type_id""",
    "5c" -> """
      SELECT MIN(t.title) AS american_movie
      FROM company_type AS ct, info_type AS it, movie_companies AS mc,
           movie_info AS mi, title AS t
      WHERE ct.kind = 'production companies'
        AND mc.note NOT LIKE '%(TV)%' AND mc.note LIKE '%(USA)%'
        AND mi.info IN ('Sweden','Norway','Germany','Denmark','Swedish',
                        'Denish','Norwegian','German','USA','American')
        AND t.production_year > 1990
        AND t.id = mi.movie_id AND t.id = mc.movie_id
        AND mc.movie_id = mi.movie_id AND ct.id = mc.company_type_id
        AND it.id = mi.info_type_id""",

    // ---- family 6: t, ci->n, mk->k (5) ----
    "6a" -> """
      SELECT MIN(k.keyword) AS movie_keyword, MIN(n.name) AS actor_name,
             MIN(t.title) AS marvel_movie
      FROM cast_info AS ci, keyword AS k, movie_keyword AS mk,
           name AS n, title AS t
      WHERE k.keyword = 'marvel-cinematic-universe'
        AND n.name LIKE '%Downey%Robert%' AND t.production_year > 2010
        AND k.id = mk.keyword_id AND t.id = mk.movie_id
        AND t.id = ci.movie_id AND ci.movie_id = mk.movie_id
        AND n.id = ci.person_id""",
    "6b" -> """
      SELECT MIN(k.keyword) AS movie_keyword, MIN(n.name) AS actor_name,
             MIN(t.title) AS hero_movie
      FROM cast_info AS ci, keyword AS k, movie_keyword AS mk,
           name AS n, title AS t
      WHERE k.keyword IN ('superhero','sequel','second-part','marvel-comics',
                          'based-on-comic','tv-special','fight','violence')
        AND n.name LIKE '%Downey%Robert%' AND t.production_year > 2014
        AND k.id = mk.keyword_id AND t.id = mk.movie_id
        AND t.id = ci.movie_id AND ci.movie_id = mk.movie_id
        AND n.id = ci.person_id""",
    "6c" -> """
      SELECT MIN(k.keyword) AS movie_keyword, MIN(n.name) AS actor_name,
             MIN(t.title) AS marvel_movie
      FROM cast_info AS ci, keyword AS k, movie_keyword AS mk,
           name AS n, title AS t
      WHERE k.keyword = 'marvel-cinematic-universe'
        AND n.name LIKE '%Downey%Robert%' AND t.production_year > 2014
        AND k.id = mk.keyword_id AND t.id = mk.movie_id
        AND t.id = ci.movie_id AND ci.movie_id = mk.movie_id
        AND n.id = ci.person_id""",
    "6d" -> """
      SELECT MIN(k.keyword) AS movie_keyword, MIN(n.name) AS actor_name,
             MIN(t.title) AS hero_movie
      FROM cast_info AS ci, keyword AS k, movie_keyword AS mk,
           name AS n, title AS t
      WHERE k.keyword IN ('superhero','sequel','second-part','marvel-comics',
                          'based-on-comic','tv-special','fight','violence')
        AND n.name LIKE '%Downey%Robert%' AND t.production_year > 2000
        AND k.id = mk.keyword_id AND t.id = mk.movie_id
        AND t.id = ci.movie_id AND ci.movie_id = mk.movie_id
        AND n.id = ci.person_id""",
    "6e" -> """
      SELECT MIN(k.keyword) AS movie_keyword, MIN(n.name) AS actor_name,
             MIN(t.title) AS marvel_movie
      FROM cast_info AS ci, keyword AS k, movie_keyword AS mk,
           name AS n, title AS t
      WHERE k.keyword = 'marvel-cinematic-universe'
        AND n.name LIKE '%Downey%Robert%' AND t.production_year > 2000
        AND k.id = mk.keyword_id AND t.id = mk.movie_id
        AND t.id = ci.movie_id AND ci.movie_id = mk.movie_id
        AND n.id = ci.person_id""",
    "6f" -> """
      SELECT MIN(k.keyword) AS movie_keyword, MIN(n.name) AS actor_name,
             MIN(t.title) AS hero_movie
      FROM cast_info AS ci, keyword AS k, movie_keyword AS mk,
           name AS n, title AS t
      WHERE k.keyword IN ('superhero','sequel','second-part','marvel-comics',
                          'based-on-comic','tv-special','fight','violence')
        AND t.production_year > 2000
        AND k.id = mk.keyword_id AND t.id = mk.movie_id
        AND t.id = ci.movie_id AND ci.movie_id = mk.movie_id
        AND n.id = ci.person_id""",

    // ---- family 7: t, ci->{n->an, n->pi->it}, ml->lt (8) ----
    "7a" -> """
      SELECT MIN(n.name) AS of_person, MIN(t.title) AS biography_movie
      FROM aka_name AS an, cast_info AS ci, info_type AS it,
           link_type AS lt, movie_link AS ml, name AS n,
           person_info AS pi, title AS t
      WHERE an.name LIKE '%a%' AND it.info = 'mini biography'
        AND lt.link = 'features' AND n.name_pcode_cf BETWEEN 'A' AND 'F'
        AND (n.gender = 'm' OR (n.gender = 'f' AND n.name LIKE 'B%'))
        AND pi.note = 'Volker Boehm'
        AND t.production_year BETWEEN 1980 AND 1995
        AND n.id = an.person_id AND n.id = pi.person_id
        AND ci.person_id = n.id AND t.id = ci.movie_id
        AND ml.linked_movie_id = t.id AND lt.id = ml.link_type_id
        AND it.id = pi.info_type_id AND pi.person_id = an.person_id
        AND pi.person_id = ci.person_id AND an.person_id = ci.person_id
        AND ci.movie_id = ml.linked_movie_id""",
    "7b" -> """
      SELECT MIN(n.name) AS of_person, MIN(t.title) AS biography_movie
      FROM aka_name AS an, cast_info AS ci, info_type AS it,
           link_type AS lt, movie_link AS ml, name AS n,
           person_info AS pi, title AS t
      WHERE an.name LIKE '%a%' AND it.info = 'mini biography'
        AND lt.link = 'features' AND n.name_pcode_cf LIKE 'D%'
        AND n.gender = 'm' AND pi.note = 'Volker Boehm'
        AND t.production_year BETWEEN 1980 AND 1984
        AND n.id = an.person_id AND n.id = pi.person_id
        AND ci.person_id = n.id AND t.id = ci.movie_id
        AND ml.linked_movie_id = t.id AND lt.id = ml.link_type_id
        AND it.id = pi.info_type_id AND pi.person_id = an.person_id
        AND pi.person_id = ci.person_id AND an.person_id = ci.person_id
        AND ci.movie_id = ml.linked_movie_id""",
    "7c" -> """
      SELECT MIN(n.name) AS cast_member_name, MIN(t.title) AS cast_member_movie
      FROM aka_name AS an, cast_info AS ci, info_type AS it,
           link_type AS lt, movie_link AS ml, name AS n,
           person_info AS pi, title AS t
      WHERE an.name IS NOT NULL
        AND (an.name LIKE '%a%' OR an.name LIKE 'A%')
        AND it.info = 'mini biography'
        AND lt.link IN ('references','referenced in','features','featured in')
        AND n.name_pcode_cf BETWEEN 'A' AND 'F'
        AND (n.gender = 'm' OR (n.gender = 'f' AND n.name LIKE 'A%'))
        AND pi.note IS NOT NULL
        AND t.production_year BETWEEN 1980 AND 2010
        AND n.id = an.person_id AND n.id = pi.person_id
        AND ci.person_id = n.id AND t.id = ci.movie_id
        AND ml.linked_movie_id = t.id AND lt.id = ml.link_type_id
        AND it.id = pi.info_type_id AND pi.person_id = an.person_id
        AND pi.person_id = ci.person_id AND an.person_id = ci.person_id
        AND ci.movie_id = ml.linked_movie_id""",

    // ---- family 8: t, ci->{an, n, rt}, mc->cn (7) ----
    "8a" -> """
      SELECT MIN(an.name) AS actress_pseudonym, MIN(t.title) AS japanese_movie_dubbed
      FROM aka_name AS an, cast_info AS ci, company_name AS cn,
           movie_companies AS mc, name AS n, role_type AS rt, title AS t
      WHERE ci.note = '(voice: English version)' AND cn.country_code = '[jp]'
        AND mc.note LIKE '%(Japan)%' AND mc.note NOT LIKE '%(USA)%'
        AND n.name LIKE '%Yo%' AND n.name NOT LIKE '%Yu%'
        AND rt.role = 'actress'
        AND an.person_id = n.id AND n.id = ci.person_id
        AND ci.movie_id = t.id AND t.id = mc.movie_id
        AND mc.company_id = cn.id AND ci.role_id = rt.id
        AND an.person_id = ci.person_id AND ci.movie_id = mc.movie_id""",
    "8b" -> """
      SELECT MIN(an.name) AS acress_pseudonym, MIN(t.title) AS japanese_anime_movie
      FROM aka_name AS an, cast_info AS ci, company_name AS cn,
           movie_companies AS mc, name AS n, role_type AS rt, title AS t
      WHERE ci.note = '(voice: English version)' AND cn.country_code = '[jp]'
        AND mc.note LIKE '%(Japan)%' AND mc.note NOT LIKE '%(USA)%'
        AND (mc.note LIKE '%(2006)%' OR mc.note LIKE '%(2007)%')
        AND n.name LIKE '%Yo%' AND n.name NOT LIKE '%Yu%'
        AND rt.role = 'actress'
        AND t.production_year BETWEEN 2006 AND 2007
        AND (t.title LIKE 'One Piece%' OR t.title LIKE 'Dragon Ball Z%')
        AND an.person_id = n.id AND n.id = ci.person_id
        AND ci.movie_id = t.id AND t.id = mc.movie_id
        AND mc.company_id = cn.id AND ci.role_id = rt.id
        AND an.person_id = ci.person_id AND ci.movie_id = mc.movie_id""",
    "8c" -> """
      SELECT MIN(an.name) AS writer_pseudo_name, MIN(t.title) AS movie_title
      FROM aka_name AS an, cast_info AS ci, company_name AS cn,
           movie_companies AS mc, name AS n, role_type AS rt, title AS t
      WHERE cn.country_code = '[us]' AND rt.role = 'writer'
        AND an.person_id = n.id AND n.id = ci.person_id
        AND ci.movie_id = t.id AND t.id = mc.movie_id
        AND mc.company_id = cn.id AND ci.role_id = rt.id
        AND an.person_id = ci.person_id AND ci.movie_id = mc.movie_id""",
    "8d" -> """
      SELECT MIN(an.name) AS costume_designer_pseudo, MIN(t.title) AS movie_with_costumes
      FROM aka_name AS an, cast_info AS ci, company_name AS cn,
           movie_companies AS mc, name AS n, role_type AS rt, title AS t
      WHERE cn.country_code = '[us]' AND rt.role = 'costume designer'
        AND an.person_id = n.id AND n.id = ci.person_id
        AND ci.movie_id = t.id AND t.id = mc.movie_id
        AND mc.company_id = cn.id AND ci.role_id = rt.id
        AND an.person_id = ci.person_id AND ci.movie_id = mc.movie_id""",

    // ---- family 9: t, an, ci->{n,rt}, mc->cn (8) ----
    "9a" -> """
      SELECT MIN(an.name) AS alternative_name, MIN(chn.name) AS character_name,
             MIN(t.title) AS movie
      FROM aka_name AS an, char_name AS chn, cast_info AS ci,
           company_name AS cn, movie_companies AS mc, name AS n,
           role_type AS rt, title AS t
      WHERE ci.note IN ('(voice)','(voice: Japanese version)',
                        '(voice) (uncredited)','(voice: English version)')
        AND cn.country_code = '[us]'
        AND mc.note IS NOT NULL
        AND (mc.note LIKE '%(USA)%' OR mc.note LIKE '%(worldwide)%')
        AND n.gender = 'f' AND n.name LIKE '%Ang%' AND rt.role = 'actress'
        AND t.production_year BETWEEN 2005 AND 2015
        AND ci.movie_id = t.id AND t.id = mc.movie_id
        AND ci.movie_id = mc.movie_id AND mc.company_id = cn.id
        AND ci.role_id = rt.id AND n.id = ci.person_id
        AND chn.id = ci.person_role_id AND an.person_id = n.id
        AND an.person_id = ci.person_id""",
    "9b" -> """
      SELECT MIN(an.name) AS alternative_name, MIN(chn.name) AS voiced_character,
             MIN(n.name) AS voicing_actress, MIN(t.title) AS american_movie
      FROM aka_name AS an, char_name AS chn, cast_info AS ci,
           company_name AS cn, movie_companies AS mc, name AS n,
           role_type AS rt, title AS t
      WHERE ci.note = '(voice)' AND cn.country_code = '[us]'
        AND mc.note LIKE '%(200%)%'
        AND (mc.note LIKE '%(USA)%' OR mc.note LIKE '%(worldwide)%')
        AND n.gender = 'f' AND n.name LIKE '%Angel%' AND rt.role = 'actress'
        AND t.production_year BETWEEN 2007 AND 2010
        AND ci.movie_id = t.id AND t.id = mc.movie_id
        AND ci.movie_id = mc.movie_id AND mc.company_id = cn.id
        AND ci.role_id = rt.id AND n.id = ci.person_id
        AND chn.id = ci.person_role_id AND an.person_id = n.id
        AND an.person_id = ci.person_id""",
    "9c" -> """
      SELECT MIN(an.name) AS alternative_name, MIN(chn.name) AS voiced_character_name,
             MIN(n.name) AS voicing_actress, MIN(t.title) AS american_movie
      FROM aka_name AS an, char_name AS chn, cast_info AS ci,
           company_name AS cn, movie_companies AS mc, name AS n,
           role_type AS rt, title AS t
      WHERE ci.note IN ('(voice)','(voice: Japanese version)',
                        '(voice) (uncredited)','(voice: English version)')
        AND cn.country_code = '[us]'
        AND n.gender = 'f' AND n.name LIKE '%An%' AND rt.role = 'actress'
        AND ci.movie_id = t.id AND t.id = mc.movie_id
        AND ci.movie_id = mc.movie_id AND mc.company_id = cn.id
        AND ci.role_id = rt.id AND n.id = ci.person_id
        AND chn.id = ci.person_role_id AND an.person_id = n.id
        AND an.person_id = ci.person_id""",
    "9d" -> """
      SELECT MIN(an.name) AS alternative_name, MIN(chn.name) AS voiced_char_name,
             MIN(n.name) AS voicing_actress, MIN(t.title) AS american_movie
      FROM aka_name AS an, char_name AS chn, cast_info AS ci,
           company_name AS cn, movie_companies AS mc, name AS n,
           role_type AS rt, title AS t
      WHERE ci.note IN ('(voice)','(voice: Japanese version)',
                        '(voice) (uncredited)','(voice: English version)')
        AND cn.country_code = '[us]' AND n.gender = 'f' AND rt.role = 'actress'
        AND ci.movie_id = t.id AND t.id = mc.movie_id
        AND ci.movie_id = mc.movie_id AND mc.company_id = cn.id
        AND ci.role_id = rt.id AND n.id = ci.person_id
        AND chn.id = ci.person_role_id AND an.person_id = n.id
        AND an.person_id = ci.person_id""",

    // ---- family 10: t, ci->{chn,rt}, mc->{cn,ct} (7) ----
    "10a" -> """
      SELECT MIN(chn.name) AS uncredited_voiced_character, MIN(t.title) AS russian_movie
      FROM char_name AS chn, cast_info AS ci, company_name AS cn,
           company_type AS ct, movie_companies AS mc, role_type AS rt,
           title AS t
      WHERE ci.note LIKE '%(voice)%' AND ci.note LIKE '%(uncredited)%'
        AND cn.country_code = '[ru]' AND rt.role = 'actor'
        AND t.production_year > 2005
        AND t.id = mc.movie_id AND t.id = ci.movie_id
        AND ci.movie_id = mc.movie_id AND chn.id = ci.person_role_id
        AND rt.id = ci.role_id AND cn.id = mc.company_id
        AND ct.id = mc.company_type_id""",
    "10b" -> """
      SELECT MIN(chn.name) AS character, MIN(t.title) AS russian_mov_with_actor_producer
      FROM char_name AS chn, cast_info AS ci, company_name AS cn,
           company_type AS ct, movie_companies AS mc, role_type AS rt,
           title AS t
      WHERE ci.note LIKE '%(producer)%' AND cn.country_code = '[ru]'
        AND rt.role = 'actor' AND t.production_year > 2010
        AND t.id = mc.movie_id AND t.id = ci.movie_id
        AND ci.movie_id = mc.movie_id AND chn.id = ci.person_role_id
        AND rt.id = ci.role_id AND cn.id = mc.company_id
        AND ct.id = mc.company_type_id""",
    "10c" -> """
      SELECT MIN(chn.name) AS character, MIN(t.title) AS movie_with_american_producer
      FROM char_name AS chn, cast_info AS ci, company_name AS cn,
           company_type AS ct, movie_companies AS mc, role_type AS rt,
           title AS t
      WHERE ci.note LIKE '%(producer)%' AND cn.country_code = '[us]'
        AND t.production_year > 1990
        AND t.id = mc.movie_id AND t.id = ci.movie_id
        AND ci.movie_id = mc.movie_id AND chn.id = ci.person_role_id
        AND rt.id = ci.role_id AND cn.id = mc.company_id
        AND ct.id = mc.company_type_id""",

    // ---- family 11: t, mc->{cn,ct}, mk->k, ml->lt (8) ----
    "11a" -> """
      SELECT MIN(cn.name) AS from_company, MIN(lt.link) AS movie_link_type,
             MIN(t.title) AS non_polish_sequel_movie
      FROM company_name AS cn, company_type AS ct, keyword AS k,
           link_type AS lt, movie_companies AS mc, movie_keyword AS mk,
           movie_link AS ml, title AS t
      WHERE cn.country_code != '[pl]'
        AND (cn.name LIKE '%Film%' OR cn.name LIKE '%Warner%')
        AND ct.kind = 'production companies' AND k.keyword = 'sequel'
        AND lt.link LIKE '%follow%' AND mc.note IS NULL
        AND t.production_year BETWEEN 1950 AND 2000
        AND lt.id = ml.link_type_id AND ml.movie_id = t.id
        AND t.id = mk.movie_id AND mk.keyword_id = k.id
        AND t.id = mc.movie_id AND mc.company_type_id = ct.id
        AND mc.company_id = cn.id AND ml.movie_id = mk.movie_id
        AND ml.movie_id = mc.movie_id AND mk.movie_id = mc.movie_id""",
    "11b" -> """
      SELECT MIN(cn.name) AS from_company, MIN(lt.link) AS movie_link_type,
             MIN(t.title) AS sequel_movie
      FROM company_name AS cn, company_type AS ct, keyword AS k,
           link_type AS lt, movie_companies AS mc, movie_keyword AS mk,
           movie_link AS ml, title AS t
      WHERE cn.country_code != '[pl]'
        AND (cn.name LIKE '20th Century Fox%' OR cn.name LIKE 'Twentieth Century Fox%')
        AND ct.kind != 'production companies' AND k.keyword = 'sequel'
        AND lt.link LIKE '%follows%' AND mc.note IS NULL
        AND t.production_year = 1998
        AND lt.id = ml.link_type_id AND ml.movie_id = t.id
        AND t.id = mk.movie_id AND mk.keyword_id = k.id
        AND t.id = mc.movie_id AND mc.company_type_id = ct.id
        AND mc.company_id = cn.id AND ml.movie_id = mk.movie_id
        AND ml.movie_id = mc.movie_id AND mk.movie_id = mc.movie_id""",
    "11c" -> """
      SELECT MIN(cn.name) AS from_company, MIN(mc.note) AS production_note,
             MIN(t.title) AS movie_based_on_book
      FROM company_name AS cn, company_type AS ct, keyword AS k,
           link_type AS lt, movie_companies AS mc, movie_keyword AS mk,
           movie_link AS ml, title AS t
      WHERE cn.country_code != '[pl]'
        AND (cn.name LIKE '20th Century Fox%' OR cn.name LIKE 'Twentieth Century Fox%')
        AND k.keyword IN ('sequel','revenge','based-on-novel')
        AND mc.note IS NOT NULL AND t.production_year > 1950
        AND lt.id = ml.link_type_id AND ml.movie_id = t.id
        AND t.id = mk.movie_id AND mk.keyword_id = k.id
        AND t.id = mc.movie_id AND mc.company_type_id = ct.id
        AND mc.company_id = cn.id AND ml.movie_id = mk.movie_id
        AND ml.movie_id = mc.movie_id AND mk.movie_id = mc.movie_id""",
    "11d" -> """
      SELECT MIN(cn.name) AS from_company, MIN(mc.note) AS production_note,
             MIN(t.title) AS movie_based_on_book
      FROM company_name AS cn, company_type AS ct, keyword AS k,
           link_type AS lt, movie_companies AS mc, movie_keyword AS mk,
           movie_link AS ml, title AS t
      WHERE cn.country_code != '[pl]'
        AND k.keyword IN ('sequel','revenge','based-on-novel')
        AND mc.note IS NOT NULL AND t.production_year > 1950
        AND lt.id = ml.link_type_id AND ml.movie_id = t.id
        AND t.id = mk.movie_id AND mk.keyword_id = k.id
        AND t.id = mc.movie_id AND mc.company_type_id = ct.id
        AND mc.company_id = cn.id AND ml.movie_id = mk.movie_id
        AND ml.movie_id = mc.movie_id AND mk.movie_id = mc.movie_id""",

    // ---- family 12: t, mc->{cn,ct}, mi->it1, mi_idx->it2 (8) ----
    "12a" -> """
      SELECT MIN(cn.name) AS movie_company, MIN(mi_idx.info) AS rating,
             MIN(t.title) AS drama_horror_movie
      FROM company_name AS cn, company_type AS ct, info_type AS it1,
           info_type AS it2, movie_companies AS mc, movie_info AS mi,
           movie_info_idx AS mi_idx, title AS t
      WHERE cn.country_code = '[us]' AND ct.kind = 'production companies'
        AND it1.info = 'genres' AND it2.info = 'rating'
        AND mi.info IN ('Drama','Horror') AND mi_idx.info > '8.0'
        AND t.production_year BETWEEN 2005 AND 2008
        AND t.id = mi.movie_id AND t.id = mi_idx.movie_id
        AND mi.info_type_id = it1.id AND mi_idx.info_type_id = it2.id
        AND t.id = mc.movie_id AND ct.id = mc.company_type_id
        AND cn.id = mc.company_id AND mc.movie_id = mi.movie_id
        AND mc.movie_id = mi_idx.movie_id AND mi.movie_id = mi_idx.movie_id""",
    "12b" -> """
      SELECT MIN(mi.info) AS budget, MIN(t.title) AS unsuccsessful_movie
      FROM company_name AS cn, company_type AS ct, info_type AS it1,
           info_type AS it2, movie_companies AS mc, movie_info AS mi,
           movie_info_idx AS mi_idx, title AS t
      WHERE cn.country_code = '[us]'
        AND ct.kind IS NOT NULL
        AND (ct.kind = 'production companies' OR ct.kind = 'distributors')
        AND it1.info = 'budget' AND it2.info = 'bottom 10 rank'
        AND t.production_year > 2000
        AND (t.title LIKE 'Birdemic%' OR t.title LIKE '%Movie%')
        AND t.id = mi.movie_id AND t.id = mi_idx.movie_id
        AND mi.info_type_id = it1.id AND mi_idx.info_type_id = it2.id
        AND t.id = mc.movie_id AND ct.id = mc.company_type_id
        AND cn.id = mc.company_id AND mc.movie_id = mi.movie_id
        AND mc.movie_id = mi_idx.movie_id AND mi.movie_id = mi_idx.movie_id""",
    "12c" -> """
      SELECT MIN(cn.name) AS movie_company, MIN(mi_idx.info) AS rating,
             MIN(t.title) AS mainstream_movie
      FROM company_name AS cn, company_type AS ct, info_type AS it1,
           info_type AS it2, movie_companies AS mc, movie_info AS mi,
           movie_info_idx AS mi_idx, title AS t
      WHERE cn.country_code = '[us]' AND ct.kind = 'production companies'
        AND it1.info = 'genres' AND it2.info = 'rating'
        AND mi.info IN ('Drama','Horror','Western','Family')
        AND mi_idx.info > '7.0'
        AND t.production_year BETWEEN 2000 AND 2010
        AND t.id = mi.movie_id AND t.id = mi_idx.movie_id
        AND mi.info_type_id = it1.id AND mi_idx.info_type_id = it2.id
        AND t.id = mc.movie_id AND ct.id = mc.company_type_id
        AND cn.id = mc.company_id AND mc.movie_id = mi.movie_id
        AND mc.movie_id = mi_idx.movie_id AND mi.movie_id = mi_idx.movie_id""",

    // ---- family 13: 12 + kt on the hub (9) ----
    "13a" -> """
      SELECT MIN(mi.info) AS release_date, MIN(mi_idx.info) AS rating,
             MIN(t.title) AS german_movie
      FROM company_name AS cn, company_type AS ct, info_type AS it1,
           info_type AS it2, kind_type AS kt, movie_companies AS mc,
           movie_info AS mi, movie_info_idx AS mi_idx, title AS t
      WHERE cn.country_code = '[de]' AND ct.kind = 'production companies'
        AND it1.info = 'rating' AND it2.info = 'release dates'
        AND kt.kind = 'movie'
        AND mi.movie_id = t.id AND it2.id = mi.info_type_id
        AND kt.id = t.kind_id AND mc.movie_id = t.id
        AND cn.id = mc.company_id AND ct.id = mc.company_type_id
        AND mi_idx.movie_id = t.id AND it1.id = mi_idx.info_type_id
        AND mi.movie_id = mi_idx.movie_id AND mi.movie_id = mc.movie_id
        AND mi_idx.movie_id = mc.movie_id""",
    "13b" -> """
      SELECT MIN(cn.name) AS producing_company, MIN(mi_idx.info) AS rating,
             MIN(t.title) AS movie_about_winning
      FROM company_name AS cn, company_type AS ct, info_type AS it1,
           info_type AS it2, kind_type AS kt, movie_companies AS mc,
           movie_info AS mi, movie_info_idx AS mi_idx, title AS t
      WHERE cn.country_code = '[us]' AND ct.kind = 'production companies'
        AND it1.info = 'rating' AND it2.info = 'release dates'
        AND kt.kind = 'movie' AND t.title != ''
        AND (t.title LIKE '%Champion%' OR t.title LIKE '%Loser%')
        AND mi.movie_id = t.id AND it2.id = mi.info_type_id
        AND kt.id = t.kind_id AND mc.movie_id = t.id
        AND cn.id = mc.company_id AND ct.id = mc.company_type_id
        AND mi_idx.movie_id = t.id AND it1.id = mi_idx.info_type_id
        AND mi.movie_id = mi_idx.movie_id AND mi.movie_id = mc.movie_id
        AND mi_idx.movie_id = mc.movie_id""",
    "13c" -> """
      SELECT MIN(cn.name) AS producing_company, MIN(mi_idx.info) AS rating,
             MIN(t.title) AS movie_about_winning
      FROM company_name AS cn, company_type AS ct, info_type AS it1,
           info_type AS it2, kind_type AS kt, movie_companies AS mc,
           movie_info AS mi, movie_info_idx AS mi_idx, title AS t
      WHERE cn.country_code = '[us]' AND ct.kind = 'production companies'
        AND it1.info = 'rating' AND it2.info = 'release dates'
        AND kt.kind = 'movie' AND t.title != ''
        AND (t.title LIKE 'Champion%' OR t.title LIKE 'Loser%')
        AND mi.movie_id = t.id AND it2.id = mi.info_type_id
        AND kt.id = t.kind_id AND mc.movie_id = t.id
        AND cn.id = mc.company_id AND ct.id = mc.company_type_id
        AND mi_idx.movie_id = t.id AND it1.id = mi_idx.info_type_id
        AND mi.movie_id = mi_idx.movie_id AND mi.movie_id = mc.movie_id
        AND mi_idx.movie_id = mc.movie_id""",
    "13d" -> """
      SELECT MIN(cn.name) AS producing_company, MIN(mi_idx.info) AS rating,
             MIN(t.title) AS movie
      FROM company_name AS cn, company_type AS ct, info_type AS it1,
           info_type AS it2, kind_type AS kt, movie_companies AS mc,
           movie_info AS mi, movie_info_idx AS mi_idx, title AS t
      WHERE cn.country_code = '[us]' AND ct.kind = 'production companies'
        AND it1.info = 'rating' AND it2.info = 'release dates'
        AND kt.kind = 'movie'
        AND mi.movie_id = t.id AND it2.id = mi.info_type_id
        AND kt.id = t.kind_id AND mc.movie_id = t.id
        AND cn.id = mc.company_id AND ct.id = mc.company_type_id
        AND mi_idx.movie_id = t.id AND it1.id = mi_idx.info_type_id
        AND mi.movie_id = mi_idx.movie_id AND mi.movie_id = mc.movie_id
        AND mi_idx.movie_id = mc.movie_id""",

    // ---- family 14: t, mk->k, mi->it1, mi_idx->it2, kt hub (8) ----
    "14a" -> """
      SELECT MIN(mi_idx.info) AS rating, MIN(t.title) AS northern_dark_movie
      FROM info_type AS it1, info_type AS it2, keyword AS k,
           kind_type AS kt, movie_info AS mi, movie_info_idx AS mi_idx,
           movie_keyword AS mk, title AS t
      WHERE it1.info = 'countries' AND it2.info = 'rating'
        AND k.keyword IN ('murder','murder-in-title','blood','violence')
        AND kt.kind = 'movie'
        AND mi.info IN ('Sweden','Norway','Germany','Denmark','Swedish',
                        'Denish','Norwegian','German','USA','American')
        AND mi_idx.info < '8.5' AND t.production_year > 2010
        AND kt.id = t.kind_id AND t.id = mi.movie_id
        AND t.id = mk.movie_id AND t.id = mi_idx.movie_id
        AND mk.movie_id = mi.movie_id AND mk.movie_id = mi_idx.movie_id
        AND mi.movie_id = mi_idx.movie_id AND k.id = mk.keyword_id
        AND it1.id = mi.info_type_id AND it2.id = mi_idx.info_type_id""",
    "14b" -> """
      SELECT MIN(mi_idx.info) AS rating, MIN(t.title) AS western_dark_production
      FROM info_type AS it1, info_type AS it2, keyword AS k,
           kind_type AS kt, movie_info AS mi, movie_info_idx AS mi_idx,
           movie_keyword AS mk, title AS t
      WHERE it1.info = 'countries' AND it2.info = 'rating'
        AND k.keyword IN ('murder','murder-in-title')
        AND kt.kind = 'movie'
        AND mi.info IN ('Sweden','Norway','Germany','Denmark','Swedish',
                        'Denish','Norwegian','German','USA','American')
        AND mi_idx.info > '6.0' AND t.production_year > 2010
        AND (t.title LIKE '%murder%' OR t.title LIKE '%Murder%'
             OR t.title LIKE '%Mord%')
        AND kt.id = t.kind_id AND t.id = mi.movie_id
        AND t.id = mk.movie_id AND t.id = mi_idx.movie_id
        AND mk.movie_id = mi.movie_id AND mk.movie_id = mi_idx.movie_id
        AND mi.movie_id = mi_idx.movie_id AND k.id = mk.keyword_id
        AND it1.id = mi.info_type_id AND it2.id = mi_idx.info_type_id""",
    "14c" -> """
      SELECT MIN(mi_idx.info) AS rating, MIN(t.title) AS north_european_dark_production
      FROM info_type AS it1, info_type AS it2, keyword AS k,
           kind_type AS kt, movie_info AS mi, movie_info_idx AS mi_idx,
           movie_keyword AS mk, title AS t
      WHERE it1.info = 'countries' AND it2.info = 'rating'
        AND k.keyword IN ('murder','murder-in-title','blood','violence')
        AND kt.kind IN ('movie','episode')
        AND mi.info IN ('Sweden','Norway','Germany','Denmark','Swedish',
                        'Denish','Norwegian','German','USA','American')
        AND mi_idx.info < '8.5' AND t.production_year > 2005
        AND kt.id = t.kind_id AND t.id = mi.movie_id
        AND t.id = mk.movie_id AND t.id = mi_idx.movie_id
        AND mk.movie_id = mi.movie_id AND mk.movie_id = mi_idx.movie_id
        AND mi.movie_id = mi_idx.movie_id AND k.id = mk.keyword_id
        AND it1.id = mi.info_type_id AND it2.id = mi_idx.info_type_id""",

    // ---- family 15: t, mc->cn, mi->it1, mk->k, at hub (8) ----
    "15a" -> """
      SELECT MIN(mi.info) AS release_date, MIN(t.title) AS internet_movie
      FROM aka_title AS at, company_name AS cn, company_type AS ct,
           info_type AS it1, keyword AS k, movie_companies AS mc,
           movie_info AS mi, movie_keyword AS mk, title AS t
      WHERE cn.country_code = '[us]' AND it1.info = 'release dates'
        AND mc.note LIKE '%(200%)%' AND mc.note LIKE '%(worldwide)%'
        AND mi.note LIKE '%internet%' AND mi.info LIKE 'USA:% 200%'
        AND t.production_year > 2000
        AND t.id = at.movie_id AND t.id = mi.movie_id
        AND t.id = mk.movie_id AND t.id = mc.movie_id
        AND mk.movie_id = mi.movie_id AND mk.movie_id = mc.movie_id
        AND mk.movie_id = at.movie_id AND mi.movie_id = mc.movie_id
        AND mi.movie_id = at.movie_id AND mc.movie_id = at.movie_id
        AND k.id = mk.keyword_id AND it1.id = mi.info_type_id
        AND cn.id = mc.company_id AND ct.id = mc.company_type_id""",
    "15b" -> """
      SELECT MIN(mi.info) AS release_date, MIN(t.title) AS youtube_movie
      FROM aka_title AS at, company_name AS cn, company_type AS ct,
           info_type AS it1, keyword AS k, movie_companies AS mc,
           movie_info AS mi, movie_keyword AS mk, title AS t
      WHERE cn.country_code = '[us]' AND cn.name = 'YouTube'
        AND it1.info = 'release dates'
        AND mc.note LIKE '%(200%)%' AND mc.note LIKE '%(worldwide)%'
        AND mi.note LIKE '%internet%' AND mi.info LIKE 'USA:% 200%'
        AND t.production_year BETWEEN 2005 AND 2010
        AND t.id = at.movie_id AND t.id = mi.movie_id
        AND t.id = mk.movie_id AND t.id = mc.movie_id
        AND mk.movie_id = mi.movie_id AND mk.movie_id = mc.movie_id
        AND mk.movie_id = at.movie_id AND mi.movie_id = mc.movie_id
        AND mi.movie_id = at.movie_id AND mc.movie_id = at.movie_id
        AND k.id = mk.keyword_id AND it1.id = mi.info_type_id
        AND cn.id = mc.company_id AND ct.id = mc.company_type_id""",
    "15c" -> """
      SELECT MIN(mi.info) AS release_date, MIN(t.title) AS modern_american_internet_movie
      FROM aka_title AS at, company_name AS cn, company_type AS ct,
           info_type AS it1, keyword AS k, movie_companies AS mc,
           movie_info AS mi, movie_keyword AS mk, title AS t
      WHERE cn.country_code = '[us]' AND it1.info = 'release dates'
        AND mi.note LIKE '%internet%'
        AND mi.info IS NOT NULL
        AND (mi.info LIKE 'USA:% 199%' OR mi.info LIKE 'USA:% 200%')
        AND t.production_year > 1990
        AND t.id = at.movie_id AND t.id = mi.movie_id
        AND t.id = mk.movie_id AND t.id = mc.movie_id
        AND mk.movie_id = mi.movie_id AND mk.movie_id = mc.movie_id
        AND mk.movie_id = at.movie_id AND mi.movie_id = mc.movie_id
        AND mi.movie_id = at.movie_id AND mc.movie_id = at.movie_id
        AND k.id = mk.keyword_id AND it1.id = mi.info_type_id
        AND cn.id = mc.company_id AND ct.id = mc.company_type_id""",
    "15d" -> """
      SELECT MIN(at.title) AS aka_title, MIN(t.title) AS internet_movie_title
      FROM aka_title AS at, company_name AS cn, company_type AS ct,
           info_type AS it1, keyword AS k, movie_companies AS mc,
           movie_info AS mi, movie_keyword AS mk, title AS t
      WHERE cn.country_code = '[us]' AND it1.info = 'release dates'
        AND mi.note LIKE '%internet%' AND t.production_year > 1990
        AND t.id = at.movie_id AND t.id = mi.movie_id
        AND t.id = mk.movie_id AND t.id = mc.movie_id
        AND mk.movie_id = mi.movie_id AND mk.movie_id = mc.movie_id
        AND mk.movie_id = at.movie_id AND mi.movie_id = mc.movie_id
        AND mi.movie_id = at.movie_id AND mc.movie_id = at.movie_id
        AND k.id = mk.keyword_id AND it1.id = mi.info_type_id
        AND cn.id = mc.company_id AND ct.id = mc.company_type_id""",

    // ---- family 16: t, ci->{an,n}, mc->cn, mk->k (8) ----
    "16a" -> """
      SELECT MIN(an.name) AS cool_actor_pseudonym, MIN(t.title) AS series_named_after_char
      FROM aka_name AS an, cast_info AS ci, company_name AS cn,
           keyword AS k, movie_companies AS mc, movie_keyword AS mk,
           name AS n, title AS t
      WHERE cn.country_code = '[us]' AND k.keyword = 'character-name-in-title'
        AND t.episode_nr >= 50 AND t.episode_nr < 100
        AND an.person_id = n.id AND n.id = ci.person_id
        AND ci.movie_id = t.id AND t.id = mk.movie_id
        AND mk.keyword_id = k.id AND t.id = mc.movie_id
        AND mc.company_id = cn.id AND an.person_id = ci.person_id
        AND ci.movie_id = mc.movie_id AND ci.movie_id = mk.movie_id
        AND mc.movie_id = mk.movie_id""",
    "16b" -> """
      SELECT MIN(an.name) AS cool_actor_pseudonym, MIN(t.title) AS series_named_after_char
      FROM aka_name AS an, cast_info AS ci, company_name AS cn,
           keyword AS k, movie_companies AS mc, movie_keyword AS mk,
           name AS n, title AS t
      WHERE cn.country_code = '[us]' AND k.keyword = 'character-name-in-title'
        AND an.person_id = n.id AND n.id = ci.person_id
        AND ci.movie_id = t.id AND t.id = mk.movie_id
        AND mk.keyword_id = k.id AND t.id = mc.movie_id
        AND mc.company_id = cn.id AND an.person_id = ci.person_id
        AND ci.movie_id = mc.movie_id AND ci.movie_id = mk.movie_id
        AND mc.movie_id = mk.movie_id""",
    "16c" -> """
      SELECT MIN(an.name) AS cool_actor_pseudonym, MIN(t.title) AS series_named_after_char
      FROM aka_name AS an, cast_info AS ci, company_name AS cn,
           keyword AS k, movie_companies AS mc, movie_keyword AS mk,
           name AS n, title AS t
      WHERE cn.country_code = '[us]' AND k.keyword = 'character-name-in-title'
        AND t.episode_nr < 100
        AND an.person_id = n.id AND n.id = ci.person_id
        AND ci.movie_id = t.id AND t.id = mk.movie_id
        AND mk.keyword_id = k.id AND t.id = mc.movie_id
        AND mc.company_id = cn.id AND an.person_id = ci.person_id
        AND ci.movie_id = mc.movie_id AND ci.movie_id = mk.movie_id
        AND mc.movie_id = mk.movie_id""",
    "16d" -> """
      SELECT MIN(an.name) AS cool_actor_pseudonym, MIN(t.title) AS series_named_after_char
      FROM aka_name AS an, cast_info AS ci, company_name AS cn,
           keyword AS k, movie_companies AS mc, movie_keyword AS mk,
           name AS n, title AS t
      WHERE cn.country_code = '[us]' AND k.keyword = 'character-name-in-title'
        AND t.episode_nr >= 5 AND t.episode_nr < 100
        AND an.person_id = n.id AND n.id = ci.person_id
        AND ci.movie_id = t.id AND t.id = mk.movie_id
        AND mk.keyword_id = k.id AND t.id = mc.movie_id
        AND mc.company_id = cn.id AND an.person_id = ci.person_id
        AND ci.movie_id = mc.movie_id AND ci.movie_id = mk.movie_id
        AND mc.movie_id = mk.movie_id""",

    // ---- family 17: t, ci->n, mc->cn, mk->k (7) ----
    "17a" -> """
      SELECT MIN(n.name) AS member_in_charnamed_american_movie,
             MIN(n.name) AS a1
      FROM cast_info AS ci, company_name AS cn, keyword AS k,
           movie_companies AS mc, movie_keyword AS mk, name AS n, title AS t
      WHERE cn.country_code = '[us]' AND k.keyword = 'character-name-in-title'
        AND n.name LIKE 'B%'
        AND n.id = ci.person_id AND ci.movie_id = t.id
        AND t.id = mk.movie_id AND mk.keyword_id = k.id
        AND t.id = mc.movie_id AND mc.company_id = cn.id
        AND ci.movie_id = mc.movie_id AND ci.movie_id = mk.movie_id
        AND mc.movie_id = mk.movie_id""",
    "17b" -> """
      SELECT MIN(n.name) AS member_in_charnamed_movie, MIN(n.name) AS a1
      FROM cast_info AS ci, company_name AS cn, keyword AS k,
           movie_companies AS mc, movie_keyword AS mk, name AS n, title AS t
      WHERE k.keyword = 'character-name-in-title' AND n.name LIKE 'Z%'
        AND n.id = ci.person_id AND ci.movie_id = t.id
        AND t.id = mk.movie_id AND mk.keyword_id = k.id
        AND t.id = mc.movie_id AND mc.company_id = cn.id
        AND ci.movie_id = mc.movie_id AND ci.movie_id = mk.movie_id
        AND mc.movie_id = mk.movie_id""",
    "17c" -> """
      SELECT MIN(n.name) AS member_in_charnamed_movie, MIN(n.name) AS a1
      FROM cast_info AS ci, company_name AS cn, keyword AS k,
           movie_companies AS mc, movie_keyword AS mk, name AS n, title AS t
      WHERE k.keyword = 'character-name-in-title' AND n.name LIKE 'X%'
        AND n.id = ci.person_id AND ci.movie_id = t.id
        AND t.id = mk.movie_id AND mk.keyword_id = k.id
        AND t.id = mc.movie_id AND mc.company_id = cn.id
        AND ci.movie_id = mc.movie_id AND ci.movie_id = mk.movie_id
        AND mc.movie_id = mk.movie_id""",
    "17d" -> """
      SELECT MIN(n.name) AS member_in_charnamed_movie
      FROM cast_info AS ci, company_name AS cn, keyword AS k,
           movie_companies AS mc, movie_keyword AS mk, name AS n, title AS t
      WHERE k.keyword = 'character-name-in-title' AND n.name LIKE '%Bert%'
        AND n.id = ci.person_id AND ci.movie_id = t.id
        AND t.id = mk.movie_id AND mk.keyword_id = k.id
        AND t.id = mc.movie_id AND mc.company_id = cn.id
        AND ci.movie_id = mc.movie_id AND ci.movie_id = mk.movie_id
        AND mc.movie_id = mk.movie_id""",
    "17e" -> """
      SELECT MIN(n.name) AS member_in_charnamed_movie
      FROM cast_info AS ci, company_name AS cn, keyword AS k,
           movie_companies AS mc, movie_keyword AS mk, name AS n, title AS t
      WHERE cn.country_code = '[us]' AND k.keyword = 'character-name-in-title'
        AND n.id = ci.person_id AND ci.movie_id = t.id
        AND t.id = mk.movie_id AND mk.keyword_id = k.id
        AND t.id = mc.movie_id AND mc.company_id = cn.id
        AND ci.movie_id = mc.movie_id AND ci.movie_id = mk.movie_id
        AND mc.movie_id = mk.movie_id""",
    "17f" -> """
      SELECT MIN(n.name) AS member_in_charnamed_movie
      FROM cast_info AS ci, company_name AS cn, keyword AS k,
           movie_companies AS mc, movie_keyword AS mk, name AS n, title AS t
      WHERE k.keyword = 'character-name-in-title' AND n.name LIKE '%B%'
        AND n.id = ci.person_id AND ci.movie_id = t.id
        AND t.id = mk.movie_id AND mk.keyword_id = k.id
        AND t.id = mc.movie_id AND mc.company_id = cn.id
        AND ci.movie_id = mc.movie_id AND ci.movie_id = mk.movie_id
        AND mc.movie_id = mk.movie_id""") ++ part2

  // continued in JobRealQueries2 (families 18-33) to keep each source
  // file reviewable
  private def part2: Seq[(String, String)] = JobRealQueries2.all
}
