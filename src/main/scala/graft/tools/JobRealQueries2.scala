package graft.tools

/** JOB families 18–33 (see [[JobRealQueries]] for provenance and
  * fidelity notes). */
object JobRealQueries2 {

  val all: Seq[(String, String)] = Seq(
    // ---- family 18: t, ci->n, mi->it1, mi_idx->it2 (7) ----
    "18a" -> """
      SELECT MIN(mi.info) AS movie_budget, MIN(mi_idx.info) AS movie_votes,
             MIN(t.title) AS movie_title
      FROM cast_info AS ci, info_type AS it1, info_type AS it2,
           movie_info AS mi, movie_info_idx AS mi_idx, name AS n, title AS t
      WHERE ci.note IN ('(producer)','(executive producer)')
        AND it1.info = 'budget' AND it2.info = 'votes'
        AND n.gender = 'm' AND n.name LIKE '%Tim%'
        AND t.id = mi.movie_id AND t.id = mi_idx.movie_id
        AND t.id = ci.movie_id AND ci.movie_id = mi.movie_id
        AND ci.movie_id = mi_idx.movie_id AND mi.movie_id = mi_idx.movie_id
        AND n.id = ci.person_id AND it1.id = mi.info_type_id
        AND it2.id = mi_idx.info_type_id""",
    "18b" -> """
      SELECT MIN(mi.info) AS movie_budget, MIN(mi_idx.info) AS movie_votes,
             MIN(t.title) AS movie_title
      FROM cast_info AS ci, info_type AS it1, info_type AS it2,
           movie_info AS mi, movie_info_idx AS mi_idx, name AS n, title AS t
      WHERE ci.note IN ('(writer)','(head writer)','(written by)','(story)',
                        '(story editor)')
        AND it1.info = 'genres' AND it2.info = 'rating'
        AND mi.info IN ('Horror','Thriller') AND mi.note IS NULL
        AND mi_idx.info > '8.0' AND n.gender IS NOT NULL AND n.gender = 'f'
        AND t.production_year BETWEEN 2008 AND 2014
        AND t.id = mi.movie_id AND t.id = mi_idx.movie_id
        AND t.id = ci.movie_id AND ci.movie_id = mi.movie_id
        AND ci.movie_id = mi_idx.movie_id AND mi.movie_id = mi_idx.movie_id
        AND n.id = ci.person_id AND it1.id = mi.info_type_id
        AND it2.id = mi_idx.info_type_id""",
    "18c" -> """
      SELECT MIN(mi.info) AS movie_budget, MIN(mi_idx.info) AS movie_votes,
             MIN(t.title) AS movie_title
      FROM cast_info AS ci, info_type AS it1, info_type AS it2,
           movie_info AS mi, movie_info_idx AS mi_idx, name AS n, title AS t
      WHERE ci.note IN ('(writer)','(head writer)','(written by)','(story)',
                        '(story editor)')
        AND it1.info = 'genres' AND it2.info = 'votes'
        AND mi.info IN ('Horror','Action','Sci-Fi','Thriller','Crime','War')
        AND n.gender = 'm'
        AND t.id = mi.movie_id AND t.id = mi_idx.movie_id
        AND t.id = ci.movie_id AND ci.movie_id = mi.movie_id
        AND ci.movie_id = mi_idx.movie_id AND mi.movie_id = mi_idx.movie_id
        AND n.id = ci.person_id AND it1.id = mi.info_type_id
        AND it2.id = mi_idx.info_type_id""",

    // ---- family 19: t, an, ci->{chn,n,rt}, mc->cn, mi->it (10) ----
    "19a" -> """
      SELECT MIN(n.name) AS voicing_actress, MIN(t.title) AS voiced_movie
      FROM aka_name AS an, char_name AS chn, cast_info AS ci,
           company_name AS cn, info_type AS it, movie_companies AS mc,
           movie_info AS mi, name AS n, role_type AS rt, title AS t
      WHERE ci.note IN ('(voice)','(voice: Japanese version)',
                        '(voice) (uncredited)','(voice: English version)')
        AND cn.country_code = '[us]' AND it.info = 'release dates'
        AND mc.note IS NOT NULL
        AND (mc.note LIKE '%(USA)%' OR mc.note LIKE '%(worldwide)%')
        AND mi.info IS NOT NULL
        AND (mi.info LIKE 'Japan:%200%' OR mi.info LIKE 'USA:%200%')
        AND n.gender = 'f' AND n.name LIKE '%Ang%' AND rt.role = 'actress'
        AND t.production_year BETWEEN 2005 AND 2009
        AND t.id = mi.movie_id AND t.id = mc.movie_id
        AND t.id = ci.movie_id AND mc.movie_id = ci.movie_id
        AND mc.movie_id = mi.movie_id AND mi.movie_id = ci.movie_id
        AND cn.id = mc.company_id AND it.id = mi.info_type_id
        AND n.id = ci.person_id AND rt.id = ci.role_id
        AND n.id = an.person_id AND ci.person_id = an.person_id
        AND chn.id = ci.person_role_id""",
    "19b" -> """
      SELECT MIN(n.name) AS voicing_actress, MIN(t.title) AS kung_fu_panda
      FROM aka_name AS an, char_name AS chn, cast_info AS ci,
           company_name AS cn, info_type AS it, movie_companies AS mc,
           movie_info AS mi, name AS n, role_type AS rt, title AS t
      WHERE ci.note = '(voice)' AND cn.country_code = '[us]'
        AND it.info = 'release dates' AND mc.note LIKE '%(200%)%'
        AND (mc.note LIKE '%(USA)%' OR mc.note LIKE '%(worldwide)%')
        AND mi.info IS NOT NULL
        AND (mi.info LIKE 'Japan:%2007%' OR mi.info LIKE 'USA:%2008%')
        AND n.gender = 'f' AND n.name LIKE '%Angel%' AND rt.role = 'actress'
        AND t.production_year BETWEEN 2007 AND 2008
        AND t.title LIKE '%Kung%Fu%Panda%'
        AND t.id = mi.movie_id AND t.id = mc.movie_id
        AND t.id = ci.movie_id AND mc.movie_id = ci.movie_id
        AND mc.movie_id = mi.movie_id AND mi.movie_id = ci.movie_id
        AND cn.id = mc.company_id AND it.id = mi.info_type_id
        AND n.id = ci.person_id AND rt.id = ci.role_id
        AND n.id = an.person_id AND ci.person_id = an.person_id
        AND chn.id = ci.person_role_id""",
    "19c" -> """
      SELECT MIN(n.name) AS voicing_actress, MIN(t.title) AS jap_engl_voiced_movie
      FROM aka_name AS an, char_name AS chn, cast_info AS ci,
           company_name AS cn, info_type AS it, movie_companies AS mc,
           movie_info AS mi, name AS n, role_type AS rt, title AS t
      WHERE ci.note IN ('(voice)','(voice: Japanese version)',
                        '(voice) (uncredited)','(voice: English version)')
        AND cn.country_code = '[us]' AND it.info = 'release dates'
        AND mi.info IS NOT NULL
        AND (mi.info LIKE 'Japan:%200%' OR mi.info LIKE 'USA:%200%')
        AND n.gender = 'f' AND n.name LIKE '%An%' AND rt.role = 'actress'
        AND t.production_year > 2000
        AND t.id = mi.movie_id AND t.id = mc.movie_id
        AND t.id = ci.movie_id AND mc.movie_id = ci.movie_id
        AND mc.movie_id = mi.movie_id AND mi.movie_id = ci.movie_id
        AND cn.id = mc.company_id AND it.id = mi.info_type_id
        AND n.id = ci.person_id AND rt.id = ci.role_id
        AND n.id = an.person_id AND ci.person_id = an.person_id
        AND chn.id = ci.person_role_id""",
    "19d" -> """
      SELECT MIN(n.name) AS voicing_actress, MIN(t.title) AS jap_engl_voiced_movie
      FROM aka_name AS an, char_name AS chn, cast_info AS ci,
           company_name AS cn, info_type AS it, movie_companies AS mc,
           movie_info AS mi, name AS n, role_type AS rt, title AS t
      WHERE ci.note IN ('(voice)','(voice: Japanese version)',
                        '(voice) (uncredited)','(voice: English version)')
        AND cn.country_code = '[us]' AND it.info = 'release dates'
        AND n.gender = 'f' AND rt.role = 'actress' AND t.production_year > 2000
        AND t.id = mi.movie_id AND t.id = mc.movie_id
        AND t.id = ci.movie_id AND mc.movie_id = ci.movie_id
        AND mc.movie_id = mi.movie_id AND mi.movie_id = ci.movie_id
        AND cn.id = mc.company_id AND it.id = mi.info_type_id
        AND n.id = ci.person_id AND rt.id = ci.role_id
        AND n.id = an.person_id AND ci.person_id = an.person_id
        AND chn.id = ci.person_role_id""",

    // ---- family 20: t, cc->{cct1,cct2}, ci->{chn,n}, mk->k, kt (10) ----
    "20a" -> """
      SELECT MIN(t.title) AS complete_downey_ironman_movie
      FROM complete_cast AS cc, comp_cast_type AS cct1,
           comp_cast_type AS cct2, char_name AS chn, cast_info AS ci,
           keyword AS k, kind_type AS kt, movie_keyword AS mk,
           name AS n, title AS t
      WHERE cct1.kind = 'cast' AND cct2.kind LIKE '%complete%'
        AND chn.name NOT LIKE '%Sherlock%'
        AND (chn.name LIKE '%Tony%Stark%' OR chn.name LIKE '%Iron%Man%')
        AND k.keyword IN ('superhero','sequel','second-part','marvel-comics',
                          'based-on-comic','tv-special','fight','violence')
        AND kt.kind = 'movie' AND t.production_year > 1950
        AND kt.id = t.kind_id AND t.id = mk.movie_id
        AND t.id = ci.movie_id AND t.id = cc.movie_id
        AND mk.movie_id = ci.movie_id AND mk.movie_id = cc.movie_id
        AND ci.movie_id = cc.movie_id AND chn.id = ci.person_role_id
        AND n.id = ci.person_id AND k.id = mk.keyword_id
        AND cct1.id = cc.subject_id AND cct2.id = cc.status_id""",
    "20b" -> """
      SELECT MIN(t.title) AS complete_downey_ironman_movie
      FROM complete_cast AS cc, comp_cast_type AS cct1,
           comp_cast_type AS cct2, char_name AS chn, cast_info AS ci,
           keyword AS k, kind_type AS kt, movie_keyword AS mk,
           name AS n, title AS t
      WHERE cct1.kind = 'cast' AND cct2.kind LIKE '%complete%'
        AND chn.name NOT LIKE '%Sherlock%'
        AND (chn.name LIKE '%Tony%Stark%' OR chn.name LIKE '%Iron%Man%')
        AND k.keyword IN ('superhero','sequel','second-part','marvel-comics',
                          'based-on-comic','tv-special','fight','violence')
        AND kt.kind = 'movie' AND n.name LIKE '%Downey%Robert%'
        AND t.production_year > 2000
        AND kt.id = t.kind_id AND t.id = mk.movie_id
        AND t.id = ci.movie_id AND t.id = cc.movie_id
        AND mk.movie_id = ci.movie_id AND mk.movie_id = cc.movie_id
        AND ci.movie_id = cc.movie_id AND chn.id = ci.person_role_id
        AND n.id = ci.person_id AND k.id = mk.keyword_id
        AND cct1.id = cc.subject_id AND cct2.id = cc.status_id""",
    "20c" -> """
      SELECT MIN(n.name) AS cast_member, MIN(t.title) AS complete_dynamic_hero_movie
      FROM complete_cast AS cc, comp_cast_type AS cct1,
           comp_cast_type AS cct2, char_name AS chn, cast_info AS ci,
           keyword AS k, kind_type AS kt, movie_keyword AS mk,
           name AS n, title AS t
      WHERE cct1.kind = 'cast' AND cct2.kind LIKE '%complete%'
        AND chn.name IS NOT NULL
        AND (chn.name LIKE '%man%' OR chn.name LIKE '%Man%')
        AND k.keyword IN ('superhero','marvel-comics','based-on-comic',
                          'tv-special','fight','violence','magnet','web',
                          'claw','laser')
        AND kt.kind = 'movie' AND t.production_year > 2000
        AND kt.id = t.kind_id AND t.id = mk.movie_id
        AND t.id = ci.movie_id AND t.id = cc.movie_id
        AND mk.movie_id = ci.movie_id AND mk.movie_id = cc.movie_id
        AND ci.movie_id = cc.movie_id AND chn.id = ci.person_role_id
        AND n.id = ci.person_id AND k.id = mk.keyword_id
        AND cct1.id = cc.subject_id AND cct2.id = cc.status_id""",

    // ---- family 21: t, mc->{cn,ct}, mi, mk->k, ml->lt (9) ----
    "21a" -> """
      SELECT MIN(cn.name) AS company_name, MIN(lt.link) AS link_type,
             MIN(t.title) AS western_follow_up
      FROM company_name AS cn, company_type AS ct, keyword AS k,
           link_type AS lt, movie_companies AS mc, movie_info AS mi,
           movie_keyword AS mk, movie_link AS ml, title AS t
      WHERE cn.country_code != '[pl]'
        AND (cn.name LIKE '%Film%' OR cn.name LIKE '%Warner%')
        AND ct.kind = 'production companies' AND k.keyword = 'sequel'
        AND lt.link LIKE '%follow%' AND mc.note IS NULL
        AND mi.info IN ('Sweden','Norway','Germany','Denmark','Swedish',
                        'Denish','Norwegian','German')
        AND t.production_year BETWEEN 1950 AND 2000
        AND lt.id = ml.link_type_id AND ml.movie_id = t.id
        AND t.id = mk.movie_id AND mk.keyword_id = k.id
        AND t.id = mc.movie_id AND mc.company_type_id = ct.id
        AND mc.company_id = cn.id AND mi.movie_id = t.id
        AND ml.movie_id = mk.movie_id AND ml.movie_id = mc.movie_id
        AND mk.movie_id = mc.movie_id AND ml.movie_id = mi.movie_id
        AND mk.movie_id = mi.movie_id AND mc.movie_id = mi.movie_id""",
    "21b" -> """
      SELECT MIN(cn.name) AS company_name, MIN(lt.link) AS link_type,
             MIN(t.title) AS german_follow_up
      FROM company_name AS cn, company_type AS ct, keyword AS k,
           link_type AS lt, movie_companies AS mc, movie_info AS mi,
           movie_keyword AS mk, movie_link AS ml, title AS t
      WHERE cn.country_code != '[pl]'
        AND (cn.name LIKE '%Film%' OR cn.name LIKE '%Warner%')
        AND ct.kind = 'production companies' AND k.keyword = 'sequel'
        AND lt.link LIKE '%follow%' AND mc.note IS NULL
        AND mi.info IN ('Germany','German')
        AND t.production_year BETWEEN 2000 AND 2010
        AND lt.id = ml.link_type_id AND ml.movie_id = t.id
        AND t.id = mk.movie_id AND mk.keyword_id = k.id
        AND t.id = mc.movie_id AND mc.company_type_id = ct.id
        AND mc.company_id = cn.id AND mi.movie_id = t.id
        AND ml.movie_id = mk.movie_id AND ml.movie_id = mc.movie_id
        AND mk.movie_id = mc.movie_id AND ml.movie_id = mi.movie_id
        AND mk.movie_id = mi.movie_id AND mc.movie_id = mi.movie_id""",
    "21c" -> """
      SELECT MIN(cn.name) AS company_name, MIN(lt.link) AS link_type,
             MIN(t.title) AS western_follow_up
      FROM company_name AS cn, company_type AS ct, keyword AS k,
           link_type AS lt, movie_companies AS mc, movie_info AS mi,
           movie_keyword AS mk, movie_link AS ml, title AS t
      WHERE cn.country_code != '[pl]'
        AND (cn.name LIKE '%Film%' OR cn.name LIKE '%Warner%')
        AND ct.kind = 'production companies' AND k.keyword = 'sequel'
        AND lt.link LIKE '%follow%' AND mc.note IS NULL
        AND mi.info IN ('Sweden','Norway','Germany','Denmark','Swedish',
                        'Denish','Norwegian','German','English')
        AND t.production_year BETWEEN 1950 AND 2010
        AND lt.id = ml.link_type_id AND ml.movie_id = t.id
        AND t.id = mk.movie_id AND mk.keyword_id = k.id
        AND t.id = mc.movie_id AND mc.company_type_id = ct.id
        AND mc.company_id = cn.id AND mi.movie_id = t.id
        AND ml.movie_id = mk.movie_id AND ml.movie_id = mc.movie_id
        AND mk.movie_id = mc.movie_id AND ml.movie_id = mi.movie_id
        AND mk.movie_id = mi.movie_id AND mc.movie_id = mi.movie_id""",

    // ---- family 22: t, mc->{cn,ct}, mi->it1, mi_idx->it2, mk->k, kt (11) ----
    "22a" -> """
      SELECT MIN(cn.name) AS movie_company, MIN(mi_idx.info) AS rating,
             MIN(t.title) AS western_violent_movie
      FROM company_name AS cn, company_type AS ct, info_type AS it1,
           info_type AS it2, keyword AS k, kind_type AS kt,
           movie_companies AS mc, movie_info AS mi,
           movie_info_idx AS mi_idx, movie_keyword AS mk, title AS t
      WHERE cn.country_code != '[us]' AND it1.info = 'countries'
        AND it2.info = 'rating'
        AND k.keyword IN ('murder','murder-in-title','blood','violence')
        AND kt.kind IN ('movie','episode')
        AND mc.note NOT LIKE '%(USA)%' AND mc.note LIKE '%(200%)%'
        AND mi.info IN ('Germany','German','USA','American')
        AND mi_idx.info < '7.0' AND t.production_year > 2008
        AND kt.id = t.kind_id AND t.id = mi.movie_id
        AND t.id = mk.movie_id AND t.id = mi_idx.movie_id
        AND t.id = mc.movie_id AND mk.movie_id = mi.movie_id
        AND mk.movie_id = mi_idx.movie_id AND mk.movie_id = mc.movie_id
        AND mi.movie_id = mi_idx.movie_id AND mi.movie_id = mc.movie_id
        AND mc.movie_id = mi_idx.movie_id AND k.id = mk.keyword_id
        AND it1.id = mi.info_type_id AND it2.id = mi_idx.info_type_id
        AND ct.id = mc.company_type_id AND cn.id = mc.company_id""",
    "22b" -> """
      SELECT MIN(cn.name) AS movie_company, MIN(mi_idx.info) AS rating,
             MIN(t.title) AS western_violent_movie
      FROM company_name AS cn, company_type AS ct, info_type AS it1,
           info_type AS it2, keyword AS k, kind_type AS kt,
           movie_companies AS mc, movie_info AS mi,
           movie_info_idx AS mi_idx, movie_keyword AS mk, title AS t
      WHERE cn.country_code != '[us]' AND it1.info = 'countries'
        AND it2.info = 'rating'
        AND k.keyword IN ('murder','murder-in-title','blood','violence')
        AND kt.kind IN ('movie','episode')
        AND mc.note NOT LIKE '%(USA)%' AND mc.note LIKE '%(200%)%'
        AND mi.info IN ('Germany','German','USA','American')
        AND mi_idx.info < '7.0' AND t.production_year > 2009
        AND kt.id = t.kind_id AND t.id = mi.movie_id
        AND t.id = mk.movie_id AND t.id = mi_idx.movie_id
        AND t.id = mc.movie_id AND mk.movie_id = mi.movie_id
        AND mk.movie_id = mi_idx.movie_id AND mk.movie_id = mc.movie_id
        AND mi.movie_id = mi_idx.movie_id AND mi.movie_id = mc.movie_id
        AND mc.movie_id = mi_idx.movie_id AND k.id = mk.keyword_id
        AND it1.id = mi.info_type_id AND it2.id = mi_idx.info_type_id
        AND ct.id = mc.company_type_id AND cn.id = mc.company_id""",
    "22c" -> """
      SELECT MIN(cn.name) AS movie_company, MIN(mi_idx.info) AS rating,
             MIN(t.title) AS western_violent_movie
      FROM company_name AS cn, company_type AS ct, info_type AS it1,
           info_type AS it2, keyword AS k, kind_type AS kt,
           movie_companies AS mc, movie_info AS mi,
           movie_info_idx AS mi_idx, movie_keyword AS mk, title AS t
      WHERE cn.country_code != '[us]' AND it1.info = 'countries'
        AND it2.info = 'rating'
        AND k.keyword IN ('murder','murder-in-title','blood','violence')
        AND kt.kind IN ('movie','episode')
        AND mc.note NOT LIKE '%(USA)%' AND mc.note LIKE '%(200%)%'
        AND mi.info IN ('Sweden','Norway','Germany','Denmark','Swedish',
                        'Denish','Norwegian','German','USA','American')
        AND mi_idx.info < '8.5' AND t.production_year > 2005
        AND kt.id = t.kind_id AND t.id = mi.movie_id
        AND t.id = mk.movie_id AND t.id = mi_idx.movie_id
        AND t.id = mc.movie_id AND mk.movie_id = mi.movie_id
        AND mk.movie_id = mi_idx.movie_id AND mk.movie_id = mc.movie_id
        AND mi.movie_id = mi_idx.movie_id AND mi.movie_id = mc.movie_id
        AND mc.movie_id = mi_idx.movie_id AND k.id = mk.keyword_id
        AND it1.id = mi.info_type_id AND it2.id = mi_idx.info_type_id
        AND ct.id = mc.company_type_id AND cn.id = mc.company_id""",
    "22d" -> """
      SELECT MIN(cn.name) AS movie_company, MIN(mi_idx.info) AS rating,
             MIN(t.title) AS western_violent_movie
      FROM company_name AS cn, company_type AS ct, info_type AS it1,
           info_type AS it2, keyword AS k, kind_type AS kt,
           movie_companies AS mc, movie_info AS mi,
           movie_info_idx AS mi_idx, movie_keyword AS mk, title AS t
      WHERE cn.country_code != '[us]' AND it1.info = 'countries'
        AND it2.info = 'rating'
        AND k.keyword IN ('murder','murder-in-title','blood','violence')
        AND mi.info IN ('Sweden','Norway','Germany','Denmark','Swedish',
                        'Denish','Norwegian','German','USA','American')
        AND mi_idx.info < '8.5' AND t.production_year > 2005
        AND kt.id = t.kind_id AND t.id = mi.movie_id
        AND t.id = mk.movie_id AND t.id = mi_idx.movie_id
        AND t.id = mc.movie_id AND mk.movie_id = mi.movie_id
        AND mk.movie_id = mi_idx.movie_id AND mk.movie_id = mc.movie_id
        AND mi.movie_id = mi_idx.movie_id AND mi.movie_id = mc.movie_id
        AND mc.movie_id = mi_idx.movie_id AND k.id = mk.keyword_id
        AND it1.id = mi.info_type_id AND it2.id = mi_idx.info_type_id
        AND ct.id = mc.company_type_id AND cn.id = mc.company_id""",

    // ---- family 23: t, cc->cct1, mc->{cn,ct}, mi->it1, kt (9) ----
    "23a" -> """
      SELECT MIN(kt.kind) AS movie_kind, MIN(t.title) AS complete_us_internet_movie
      FROM complete_cast AS cc, comp_cast_type AS cct1,
           company_name AS cn, company_type AS ct, info_type AS it1,
           kind_type AS kt, movie_companies AS mc, movie_info AS mi,
           title AS t
      WHERE cct1.kind = 'complete+verified' AND cn.country_code = '[us]'
        AND it1.info = 'release dates' AND kt.kind IN ('movie')
        AND mi.note LIKE '%internet%'
        AND mi.info IS NOT NULL
        AND (mi.info LIKE 'USA:% 199%' OR mi.info LIKE 'USA:% 200%')
        AND t.production_year > 2000
        AND kt.id = t.kind_id AND t.id = mi.movie_id
        AND t.id = mc.movie_id AND t.id = cc.movie_id
        AND mc.movie_id = mi.movie_id AND mc.movie_id = cc.movie_id
        AND mi.movie_id = cc.movie_id AND cn.id = mc.company_id
        AND ct.id = mc.company_type_id AND it1.id = mi.info_type_id
        AND cct1.id = cc.status_id""",
    "23b" -> """
      SELECT MIN(kt.kind) AS movie_kind, MIN(t.title) AS complete_nerdy_internet_movie
      FROM complete_cast AS cc, comp_cast_type AS cct1,
           company_name AS cn, company_type AS ct, info_type AS it1,
           keyword AS k, kind_type AS kt, movie_companies AS mc,
           movie_info AS mi, movie_keyword AS mk, title AS t
      WHERE cct1.kind = 'complete+verified' AND cn.country_code = '[us]'
        AND it1.info = 'release dates' AND k.keyword IN ('nerd','loner',
            'alienation','dignity') AND kt.kind IN ('movie')
        AND mi.note LIKE '%internet%' AND mi.info LIKE 'USA:% 200%'
        AND t.production_year > 2000
        AND kt.id = t.kind_id AND t.id = mi.movie_id
        AND t.id = mk.movie_id AND t.id = mc.movie_id
        AND t.id = cc.movie_id AND mk.movie_id = mi.movie_id
        AND mk.movie_id = mc.movie_id AND mk.movie_id = cc.movie_id
        AND mc.movie_id = mi.movie_id AND mc.movie_id = cc.movie_id
        AND mi.movie_id = cc.movie_id AND k.id = mk.keyword_id
        AND cn.id = mc.company_id AND ct.id = mc.company_type_id
        AND it1.id = mi.info_type_id AND cct1.id = cc.status_id""",
    "23c" -> """
      SELECT MIN(kt.kind) AS movie_kind, MIN(t.title) AS complete_us_internet_movie
      FROM complete_cast AS cc, comp_cast_type AS cct1,
           company_name AS cn, company_type AS ct, info_type AS it1,
           kind_type AS kt, movie_companies AS mc, movie_info AS mi,
           title AS t
      WHERE cct1.kind = 'complete+verified' AND cn.country_code = '[us]'
        AND it1.info = 'release dates'
        AND kt.kind IN ('movie','tv movie','video movie','video game')
        AND mi.note LIKE '%internet%'
        AND mi.info IS NOT NULL
        AND (mi.info LIKE 'USA:% 199%' OR mi.info LIKE 'USA:% 200%')
        AND t.production_year > 1990
        AND kt.id = t.kind_id AND t.id = mi.movie_id
        AND t.id = mc.movie_id AND t.id = cc.movie_id
        AND mc.movie_id = mi.movie_id AND mc.movie_id = cc.movie_id
        AND mi.movie_id = cc.movie_id AND cn.id = mc.company_id
        AND ct.id = mc.company_type_id AND it1.id = mi.info_type_id
        AND cct1.id = cc.status_id""",

    // ---- family 24: t, ci->{chn,n,rt}, an, mc->cn, mi->it, mk->k (12) ----
    "24a" -> """
      SELECT MIN(chn.name) AS voiced_char_name, MIN(n.name) AS voicing_actress,
             MIN(t.title) AS voiced_action_movie_jap_eng
      FROM aka_name AS an, char_name AS chn, cast_info AS ci,
           company_name AS cn, info_type AS it, keyword AS k,
           movie_companies AS mc, movie_info AS mi, movie_keyword AS mk,
           name AS n, role_type AS rt, title AS t
      WHERE ci.note IN ('(voice)','(voice: Japanese version)',
                        '(voice) (uncredited)','(voice: English version)')
        AND cn.country_code = '[us]' AND it.info = 'release dates'
        AND k.keyword IN ('hero','martial-arts','hand-to-hand-combat')
        AND mi.info IS NOT NULL
        AND (mi.info LIKE 'Japan:%201%' OR mi.info LIKE 'USA:%201%')
        AND n.gender = 'f' AND n.name LIKE '%An%' AND rt.role = 'actress'
        AND t.production_year > 2010
        AND t.id = mi.movie_id AND t.id = mc.movie_id
        AND t.id = ci.movie_id AND t.id = mk.movie_id
        AND mc.movie_id = ci.movie_id AND mc.movie_id = mi.movie_id
        AND mc.movie_id = mk.movie_id AND mi.movie_id = ci.movie_id
        AND mi.movie_id = mk.movie_id AND ci.movie_id = mk.movie_id
        AND cn.id = mc.company_id AND it.id = mi.info_type_id
        AND n.id = ci.person_id AND rt.id = ci.role_id
        AND n.id = an.person_id AND ci.person_id = an.person_id
        AND chn.id = ci.person_role_id AND k.id = mk.keyword_id""",
    "24b" -> """
      SELECT MIN(chn.name) AS voiced_char_name, MIN(n.name) AS voicing_actress,
             MIN(t.title) AS kung_fu_panda
      FROM aka_name AS an, char_name AS chn, cast_info AS ci,
           company_name AS cn, info_type AS it, keyword AS k,
           movie_companies AS mc, movie_info AS mi, movie_keyword AS mk,
           name AS n, role_type AS rt, title AS t
      WHERE ci.note IN ('(voice)','(voice: Japanese version)',
                        '(voice) (uncredited)','(voice: English version)')
        AND cn.country_code = '[us]' AND cn.name = 'DreamWorks Animation'
        AND it.info = 'release dates'
        AND k.keyword IN ('hero','martial-arts','hand-to-hand-combat',
                          'computer-animated-movie')
        AND mi.info IS NOT NULL
        AND (mi.info LIKE 'Japan:%201%' OR mi.info LIKE 'USA:%201%')
        AND n.gender = 'f' AND n.name LIKE '%An%' AND rt.role = 'actress'
        AND t.production_year > 2010 AND t.title LIKE 'Kung Fu Panda%'
        AND t.id = mi.movie_id AND t.id = mc.movie_id
        AND t.id = ci.movie_id AND t.id = mk.movie_id
        AND mc.movie_id = ci.movie_id AND mc.movie_id = mi.movie_id
        AND mc.movie_id = mk.movie_id AND mi.movie_id = ci.movie_id
        AND mi.movie_id = mk.movie_id AND ci.movie_id = mk.movie_id
        AND cn.id = mc.company_id AND it.id = mi.info_type_id
        AND n.id = ci.person_id AND rt.id = ci.role_id
        AND n.id = an.person_id AND ci.person_id = an.person_id
        AND chn.id = ci.person_role_id AND k.id = mk.keyword_id""",

    // ---- family 25: t, ci->n, mi->it1, mi_idx->it2, mk->k (9) ----
    "25a" -> """
      SELECT MIN(mi.info) AS movie_budget, MIN(mi_idx.info) AS movie_votes,
             MIN(n.name) AS male_writer, MIN(t.title) AS violent_movie_title
      FROM cast_info AS ci, info_type AS it1, info_type AS it2,
           keyword AS k, movie_info AS mi, movie_info_idx AS mi_idx,
           movie_keyword AS mk, name AS n, title AS t
      WHERE ci.note IN ('(writer)','(head writer)','(written by)','(story)',
                        '(story editor)')
        AND it1.info = 'genres' AND it2.info = 'votes'
        AND k.keyword IN ('murder','blood-splatter','cigarette-smoking',
                          'gore','death')
        AND mi.info = 'Horror' AND n.gender = 'm'
        AND t.id = mi.movie_id AND t.id = mi_idx.movie_id
        AND t.id = ci.movie_id AND t.id = mk.movie_id
        AND ci.movie_id = mi.movie_id AND ci.movie_id = mi_idx.movie_id
        AND ci.movie_id = mk.movie_id AND mi.movie_id = mi_idx.movie_id
        AND mi.movie_id = mk.movie_id AND mi_idx.movie_id = mk.movie_id
        AND n.id = ci.person_id AND it1.id = mi.info_type_id
        AND it2.id = mi_idx.info_type_id AND k.id = mk.keyword_id""",
    "25b" -> """
      SELECT MIN(mi.info) AS movie_budget, MIN(mi_idx.info) AS movie_votes,
             MIN(n.name) AS male_writer, MIN(t.title) AS violent_vampire_movie
      FROM cast_info AS ci, info_type AS it1, info_type AS it2,
           keyword AS k, movie_info AS mi, movie_info_idx AS mi_idx,
           movie_keyword AS mk, name AS n, title AS t
      WHERE ci.note IN ('(writer)','(head writer)','(written by)','(story)',
                        '(story editor)')
        AND it1.info = 'genres' AND it2.info = 'votes'
        AND k.keyword IN ('murder','blood-splatter','cigarette-smoking',
                          'gore','death')
        AND mi.info = 'Horror' AND n.gender = 'm'
        AND t.production_year > 2010 AND t.title LIKE 'Vampire%'
        AND t.id = mi.movie_id AND t.id = mi_idx.movie_id
        AND t.id = ci.movie_id AND t.id = mk.movie_id
        AND ci.movie_id = mi.movie_id AND ci.movie_id = mi_idx.movie_id
        AND ci.movie_id = mk.movie_id AND mi.movie_id = mi_idx.movie_id
        AND mi.movie_id = mk.movie_id AND mi_idx.movie_id = mk.movie_id
        AND n.id = ci.person_id AND it1.id = mi.info_type_id
        AND it2.id = mi_idx.info_type_id AND k.id = mk.keyword_id""",
    "25c" -> """
      SELECT MIN(mi.info) AS movie_budget, MIN(mi_idx.info) AS movie_votes,
             MIN(n.name) AS male_writer, MIN(t.title) AS violent_movie_title
      FROM cast_info AS ci, info_type AS it1, info_type AS it2,
           keyword AS k, movie_info AS mi, movie_info_idx AS mi_idx,
           movie_keyword AS mk, name AS n, title AS t
      WHERE ci.note IN ('(writer)','(head writer)','(written by)','(story)',
                        '(story editor)')
        AND it1.info = 'genres' AND it2.info = 'votes'
        AND k.keyword IN ('murder','violence','blood-splatter','gore',
                          'death','female-nudity','hospital')
        AND mi.info IN ('Horror','Action','Sci-Fi','Thriller','Crime','War')
        AND n.gender = 'm'
        AND t.id = mi.movie_id AND t.id = mi_idx.movie_id
        AND t.id = ci.movie_id AND t.id = mk.movie_id
        AND ci.movie_id = mi.movie_id AND ci.movie_id = mi_idx.movie_id
        AND ci.movie_id = mk.movie_id AND mi.movie_id = mi_idx.movie_id
        AND mi.movie_id = mk.movie_id AND mi_idx.movie_id = mk.movie_id
        AND n.id = ci.person_id AND it1.id = mi.info_type_id
        AND it2.id = mi_idx.info_type_id AND k.id = mk.keyword_id""",

    // ---- family 26: t, cc->{cct1,cct2}, ci->{chn,n}, mi_idx->it2, mk->k, kt (12) ----
    "26a" -> """
      SELECT MIN(chn.name) AS character_name, MIN(mi_idx.info) AS rating,
             MIN(n.name) AS playing_actor, MIN(t.title) AS complete_hero_movie
      FROM complete_cast AS cc, comp_cast_type AS cct1,
           comp_cast_type AS cct2, char_name AS chn, cast_info AS ci,
           info_type AS it2, keyword AS k, kind_type AS kt,
           movie_info_idx AS mi_idx, movie_keyword AS mk, name AS n,
           title AS t
      WHERE cct1.kind = 'cast' AND cct2.kind LIKE '%complete%'
        AND chn.name IS NOT NULL
        AND (chn.name LIKE '%man%' OR chn.name LIKE '%Man%')
        AND it2.info = 'rating'
        AND k.keyword IN ('superhero','marvel-comics','based-on-comic',
                          'tv-special','fight','violence','magnet','web',
                          'claw','laser')
        AND kt.kind = 'movie' AND mi_idx.info > '7.0'
        AND t.production_year > 2000
        AND kt.id = t.kind_id AND t.id = mk.movie_id
        AND t.id = ci.movie_id AND t.id = cc.movie_id
        AND t.id = mi_idx.movie_id AND mk.movie_id = ci.movie_id
        AND mk.movie_id = cc.movie_id AND mk.movie_id = mi_idx.movie_id
        AND ci.movie_id = cc.movie_id AND ci.movie_id = mi_idx.movie_id
        AND cc.movie_id = mi_idx.movie_id AND chn.id = ci.person_role_id
        AND n.id = ci.person_id AND k.id = mk.keyword_id
        AND cct1.id = cc.subject_id AND cct2.id = cc.status_id
        AND it2.id = mi_idx.info_type_id""",
    "26b" -> """
      SELECT MIN(chn.name) AS character_name, MIN(mi_idx.info) AS rating,
             MIN(t.title) AS complete_hero_movie
      FROM complete_cast AS cc, comp_cast_type AS cct1,
           comp_cast_type AS cct2, char_name AS chn, cast_info AS ci,
           info_type AS it2, keyword AS k, kind_type AS kt,
           movie_info_idx AS mi_idx, movie_keyword AS mk, name AS n,
           title AS t
      WHERE cct1.kind = 'cast' AND cct2.kind LIKE '%complete%'
        AND chn.name IS NOT NULL
        AND (chn.name LIKE '%man%' OR chn.name LIKE '%Man%')
        AND it2.info = 'rating'
        AND k.keyword IN ('superhero','marvel-comics','based-on-comic',
                          'fight')
        AND kt.kind = 'movie' AND mi_idx.info > '8.0'
        AND t.production_year > 2005
        AND kt.id = t.kind_id AND t.id = mk.movie_id
        AND t.id = ci.movie_id AND t.id = cc.movie_id
        AND t.id = mi_idx.movie_id AND mk.movie_id = ci.movie_id
        AND mk.movie_id = cc.movie_id AND mk.movie_id = mi_idx.movie_id
        AND ci.movie_id = cc.movie_id AND ci.movie_id = mi_idx.movie_id
        AND cc.movie_id = mi_idx.movie_id AND chn.id = ci.person_role_id
        AND n.id = ci.person_id AND k.id = mk.keyword_id
        AND cct1.id = cc.subject_id AND cct2.id = cc.status_id
        AND it2.id = mi_idx.info_type_id""",
    "26c" -> """
      SELECT MIN(chn.name) AS character_name, MIN(mi_idx.info) AS rating,
             MIN(t.title) AS complete_hero_movie
      FROM complete_cast AS cc, comp_cast_type AS cct1,
           comp_cast_type AS cct2, char_name AS chn, cast_info AS ci,
           info_type AS it2, keyword AS k, kind_type AS kt,
           movie_info_idx AS mi_idx, movie_keyword AS mk, name AS n,
           title AS t
      WHERE cct1.kind = 'cast' AND cct2.kind LIKE '%complete%'
        AND chn.name IS NOT NULL
        AND (chn.name LIKE '%man%' OR chn.name LIKE '%Man%')
        AND it2.info = 'rating'
        AND k.keyword IN ('superhero','marvel-comics','based-on-comic',
                          'tv-special','fight','violence','magnet','web',
                          'claw','laser')
        AND kt.kind = 'movie' AND t.production_year > 2000
        AND kt.id = t.kind_id AND t.id = mk.movie_id
        AND t.id = ci.movie_id AND t.id = cc.movie_id
        AND t.id = mi_idx.movie_id AND mk.movie_id = ci.movie_id
        AND mk.movie_id = cc.movie_id AND mk.movie_id = mi_idx.movie_id
        AND ci.movie_id = cc.movie_id AND ci.movie_id = mi_idx.movie_id
        AND cc.movie_id = mi_idx.movie_id AND chn.id = ci.person_role_id
        AND n.id = ci.person_id AND k.id = mk.keyword_id
        AND cct1.id = cc.subject_id AND cct2.id = cc.status_id
        AND it2.id = mi_idx.info_type_id""",

    // ---- family 27: t, cc->{cct1,cct2}, mc->{cn,ct}, mi, mk->k, ml->lt (12) ----
    "27a" -> """
      SELECT MIN(cn.name) AS producing_company, MIN(lt.link) AS link_type,
             MIN(t.title) AS complete_western_sequel
      FROM complete_cast AS cc, comp_cast_type AS cct1,
           comp_cast_type AS cct2, company_name AS cn, company_type AS ct,
           keyword AS k, link_type AS lt, movie_companies AS mc,
           movie_info AS mi, movie_keyword AS mk, movie_link AS ml,
           title AS t
      WHERE cct1.kind IN ('cast','crew') AND cct2.kind = 'complete'
        AND cn.country_code != '[pl]'
        AND (cn.name LIKE '%Film%' OR cn.name LIKE '%Warner%')
        AND ct.kind = 'production companies' AND k.keyword = 'sequel'
        AND lt.link LIKE '%follow%' AND mc.note IS NULL
        AND mi.info IN ('Sweden','Germany','Swedish','German')
        AND t.production_year BETWEEN 1950 AND 2000
        AND lt.id = ml.link_type_id AND ml.movie_id = t.id
        AND t.id = mk.movie_id AND mk.keyword_id = k.id
        AND t.id = mc.movie_id AND mc.company_type_id = ct.id
        AND mc.company_id = cn.id AND mi.movie_id = t.id
        AND t.id = cc.movie_id AND cct1.id = cc.subject_id
        AND cct2.id = cc.status_id AND ml.movie_id = mk.movie_id
        AND ml.movie_id = mc.movie_id AND mk.movie_id = mc.movie_id
        AND ml.movie_id = mi.movie_id AND mk.movie_id = mi.movie_id
        AND mc.movie_id = mi.movie_id AND ml.movie_id = cc.movie_id
        AND mk.movie_id = cc.movie_id AND mc.movie_id = cc.movie_id
        AND mi.movie_id = cc.movie_id""",
    "27b" -> """
      SELECT MIN(cn.name) AS producing_company, MIN(lt.link) AS link_type,
             MIN(t.title) AS complete_western_sequel
      FROM complete_cast AS cc, comp_cast_type AS cct1,
           comp_cast_type AS cct2, company_name AS cn, company_type AS ct,
           keyword AS k, link_type AS lt, movie_companies AS mc,
           movie_info AS mi, movie_keyword AS mk, movie_link AS ml,
           title AS t
      WHERE cct1.kind IN ('cast','crew') AND cct2.kind = 'complete+verified'
        AND cn.country_code != '[pl]'
        AND (cn.name LIKE '%Film%' OR cn.name LIKE '%Warner%')
        AND ct.kind = 'production companies' AND k.keyword = 'sequel'
        AND lt.link LIKE '%follow%' AND mc.note IS NULL
        AND mi.info IN ('Sweden','Germany','Swedish','German')
        AND t.production_year = 1998
        AND lt.id = ml.link_type_id AND ml.movie_id = t.id
        AND t.id = mk.movie_id AND mk.keyword_id = k.id
        AND t.id = mc.movie_id AND mc.company_type_id = ct.id
        AND mc.company_id = cn.id AND mi.movie_id = t.id
        AND t.id = cc.movie_id AND cct1.id = cc.subject_id
        AND cct2.id = cc.status_id AND ml.movie_id = mk.movie_id
        AND ml.movie_id = mc.movie_id AND mk.movie_id = mc.movie_id
        AND ml.movie_id = mi.movie_id AND mk.movie_id = mi.movie_id
        AND mc.movie_id = mi.movie_id AND ml.movie_id = cc.movie_id
        AND mk.movie_id = cc.movie_id AND mc.movie_id = cc.movie_id
        AND mi.movie_id = cc.movie_id""",
    "27c" -> """
      SELECT MIN(cn.name) AS producing_company, MIN(lt.link) AS link_type,
             MIN(t.title) AS complete_western_sequel
      FROM complete_cast AS cc, comp_cast_type AS cct1,
           comp_cast_type AS cct2, company_name AS cn, company_type AS ct,
           keyword AS k, link_type AS lt, movie_companies AS mc,
           movie_info AS mi, movie_keyword AS mk, movie_link AS ml,
           title AS t
      WHERE cct1.kind = 'cast' AND cct2.kind LIKE 'complete%'
        AND cn.country_code != '[pl]'
        AND (cn.name LIKE '%Film%' OR cn.name LIKE '%Warner%')
        AND ct.kind = 'production companies' AND k.keyword = 'sequel'
        AND lt.link LIKE '%follow%' AND mc.note IS NULL
        AND mi.info IN ('Sweden','Norway','Germany','Denmark','Swedish',
                        'Denish','Norwegian','German','English')
        AND t.production_year BETWEEN 1950 AND 2010
        AND lt.id = ml.link_type_id AND ml.movie_id = t.id
        AND t.id = mk.movie_id AND mk.keyword_id = k.id
        AND t.id = mc.movie_id AND mc.company_type_id = ct.id
        AND mc.company_id = cn.id AND mi.movie_id = t.id
        AND t.id = cc.movie_id AND cct1.id = cc.subject_id
        AND cct2.id = cc.status_id AND ml.movie_id = mk.movie_id
        AND ml.movie_id = mc.movie_id AND mk.movie_id = mc.movie_id
        AND ml.movie_id = mi.movie_id AND mk.movie_id = mi.movie_id
        AND mc.movie_id = mi.movie_id AND ml.movie_id = cc.movie_id
        AND mk.movie_id = cc.movie_id AND mc.movie_id = cc.movie_id
        AND mi.movie_id = cc.movie_id""",

    // ---- family 28: t, cc->{cct1,cct2}, mc->{cn,ct}, mi->it1, mi_idx->it2, mk->k, kt (14) ----
    "28a" -> """
      SELECT MIN(cn.name) AS movie_company, MIN(mi_idx.info) AS rating,
             MIN(t.title) AS complete_euro_dark_movie
      FROM complete_cast AS cc, comp_cast_type AS cct1,
           comp_cast_type AS cct2, company_name AS cn, company_type AS ct,
           info_type AS it1, info_type AS it2, keyword AS k,
           kind_type AS kt, movie_companies AS mc, movie_info AS mi,
           movie_info_idx AS mi_idx, movie_keyword AS mk, title AS t
      WHERE cct1.kind = 'crew' AND cct2.kind != 'complete+verified'
        AND cn.country_code != '[us]' AND it1.info = 'countries'
        AND it2.info = 'rating'
        AND k.keyword IN ('murder','murder-in-title','blood','violence')
        AND kt.kind IN ('movie','episode')
        AND mc.note NOT LIKE '%(USA)%' AND mc.note LIKE '%(200%)%'
        AND mi.info IN ('Sweden','Norway','Germany','Denmark','Swedish',
                        'Denish','Norwegian','German','USA','American')
        AND mi_idx.info < '8.5' AND t.production_year > 2000
        AND kt.id = t.kind_id AND t.id = mi.movie_id
        AND t.id = mk.movie_id AND t.id = mi_idx.movie_id
        AND t.id = mc.movie_id AND t.id = cc.movie_id
        AND mk.movie_id = mi.movie_id AND mk.movie_id = mi_idx.movie_id
        AND mk.movie_id = mc.movie_id AND mk.movie_id = cc.movie_id
        AND mi.movie_id = mi_idx.movie_id AND mi.movie_id = mc.movie_id
        AND mi.movie_id = cc.movie_id AND mc.movie_id = mi_idx.movie_id
        AND mc.movie_id = cc.movie_id AND mi_idx.movie_id = cc.movie_id
        AND k.id = mk.keyword_id AND it1.id = mi.info_type_id
        AND it2.id = mi_idx.info_type_id AND ct.id = mc.company_type_id
        AND cn.id = mc.company_id AND cct1.id = cc.subject_id
        AND cct2.id = cc.status_id""",
    "28b" -> """
      SELECT MIN(cn.name) AS movie_company, MIN(mi_idx.info) AS rating,
             MIN(t.title) AS complete_euro_dark_movie
      FROM complete_cast AS cc, comp_cast_type AS cct1,
           comp_cast_type AS cct2, company_name AS cn, company_type AS ct,
           info_type AS it1, info_type AS it2, keyword AS k,
           kind_type AS kt, movie_companies AS mc, movie_info AS mi,
           movie_info_idx AS mi_idx, movie_keyword AS mk, title AS t
      WHERE cct1.kind = 'crew' AND cct2.kind != 'complete+verified'
        AND cn.country_code != '[us]' AND it1.info = 'countries'
        AND it2.info = 'rating'
        AND k.keyword IN ('murder','murder-in-title','blood','violence')
        AND kt.kind IN ('movie','episode')
        AND mc.note NOT LIKE '%(USA)%' AND mc.note LIKE '%(200%)%'
        AND mi.info IN ('Sweden','Germany','Swedish','German')
        AND mi_idx.info > '6.5' AND t.production_year > 2005
        AND kt.id = t.kind_id AND t.id = mi.movie_id
        AND t.id = mk.movie_id AND t.id = mi_idx.movie_id
        AND t.id = mc.movie_id AND t.id = cc.movie_id
        AND mk.movie_id = mi.movie_id AND mk.movie_id = mi_idx.movie_id
        AND mk.movie_id = mc.movie_id AND mk.movie_id = cc.movie_id
        AND mi.movie_id = mi_idx.movie_id AND mi.movie_id = mc.movie_id
        AND mi.movie_id = cc.movie_id AND mc.movie_id = mi_idx.movie_id
        AND mc.movie_id = cc.movie_id AND mi_idx.movie_id = cc.movie_id
        AND k.id = mk.keyword_id AND it1.id = mi.info_type_id
        AND it2.id = mi_idx.info_type_id AND ct.id = mc.company_type_id
        AND cn.id = mc.company_id AND cct1.id = cc.subject_id
        AND cct2.id = cc.status_id""",
    "28c" -> """
      SELECT MIN(cn.name) AS movie_company, MIN(mi_idx.info) AS rating,
             MIN(t.title) AS complete_euro_dark_movie
      FROM complete_cast AS cc, comp_cast_type AS cct1,
           comp_cast_type AS cct2, company_name AS cn, company_type AS ct,
           info_type AS it1, info_type AS it2, keyword AS k,
           kind_type AS kt, movie_companies AS mc, movie_info AS mi,
           movie_info_idx AS mi_idx, movie_keyword AS mk, title AS t
      WHERE cct1.kind = 'cast' AND cct2.kind = 'complete'
        AND cn.country_code != '[us]' AND it1.info = 'countries'
        AND it2.info = 'rating'
        AND k.keyword IN ('murder','murder-in-title','blood','violence')
        AND kt.kind IN ('movie','episode')
        AND mc.note NOT LIKE '%(USA)%' AND mc.note LIKE '%(200%)%'
        AND mi.info IN ('Sweden','Norway','Germany','Denmark','Swedish',
                        'Denish','Norwegian','German','USA','American')
        AND mi_idx.info < '8.5' AND t.production_year > 2005
        AND kt.id = t.kind_id AND t.id = mi.movie_id
        AND t.id = mk.movie_id AND t.id = mi_idx.movie_id
        AND t.id = mc.movie_id AND t.id = cc.movie_id
        AND mk.movie_id = mi.movie_id AND mk.movie_id = mi_idx.movie_id
        AND mk.movie_id = mc.movie_id AND mk.movie_id = cc.movie_id
        AND mi.movie_id = mi_idx.movie_id AND mi.movie_id = mc.movie_id
        AND mi.movie_id = cc.movie_id AND mc.movie_id = mi_idx.movie_id
        AND mc.movie_id = cc.movie_id AND mi_idx.movie_id = cc.movie_id
        AND k.id = mk.keyword_id AND it1.id = mi.info_type_id
        AND it2.id = mi_idx.info_type_id AND ct.id = mc.company_type_id
        AND cn.id = mc.company_id AND cct1.id = cc.subject_id
        AND cct2.id = cc.status_id""",

    // ---- family 29: the 17-relation JOB maximum ----
    "29a" -> """
      SELECT MIN(chn.name) AS voiced_char, MIN(n.name) AS voicing_actress,
             MIN(t.title) AS voiced_animation
      FROM aka_name AS an, complete_cast AS cc, comp_cast_type AS cct1,
           comp_cast_type AS cct2, char_name AS chn, cast_info AS ci,
           company_name AS cn, info_type AS it1, info_type AS it3,
           keyword AS k, kind_type AS kt, movie_companies AS mc,
           movie_info AS mi, movie_keyword AS mk, name AS n,
           person_info AS pi, role_type AS rt, title AS t
      WHERE cct1.kind = 'cast' AND cct2.kind = 'complete+verified'
        AND chn.name = 'Queen'
        AND ci.note IN ('(voice)','(voice) (uncredited)',
                        '(voice: English version)')
        AND cn.country_code = '[us]' AND it1.info = 'release dates'
        AND it3.info = 'trivia' AND k.keyword = 'computer-animation'
        AND mi.info IS NOT NULL
        AND (mi.info LIKE 'Japan:%200%' OR mi.info LIKE 'USA:%200%')
        AND n.gender = 'f' AND n.name LIKE '%An%' AND rt.role = 'actress'
        AND t.title = 'Shrek 2' AND t.production_year BETWEEN 2000 AND 2010
        AND kt.id = t.kind_id AND t.id = mi.movie_id
        AND t.id = mc.movie_id AND t.id = ci.movie_id
        AND t.id = mk.movie_id AND t.id = cc.movie_id
        AND mc.movie_id = ci.movie_id AND mc.movie_id = mi.movie_id
        AND mc.movie_id = mk.movie_id AND mc.movie_id = cc.movie_id
        AND mi.movie_id = ci.movie_id AND mi.movie_id = mk.movie_id
        AND mi.movie_id = cc.movie_id AND ci.movie_id = mk.movie_id
        AND ci.movie_id = cc.movie_id AND mk.movie_id = cc.movie_id
        AND cn.id = mc.company_id AND it1.id = mi.info_type_id
        AND n.id = ci.person_id AND rt.id = ci.role_id
        AND n.id = an.person_id AND ci.person_id = an.person_id
        AND chn.id = ci.person_role_id AND n.id = pi.person_id
        AND ci.person_id = pi.person_id AND it3.id = pi.info_type_id
        AND k.id = mk.keyword_id AND cct1.id = cc.subject_id
        AND cct2.id = cc.status_id""",
    "29b" -> """
      SELECT MIN(chn.name) AS voiced_char, MIN(n.name) AS voicing_actress,
             MIN(t.title) AS voiced_animation
      FROM aka_name AS an, complete_cast AS cc, comp_cast_type AS cct1,
           comp_cast_type AS cct2, char_name AS chn, cast_info AS ci,
           company_name AS cn, info_type AS it1, info_type AS it3,
           keyword AS k, kind_type AS kt, movie_companies AS mc,
           movie_info AS mi, movie_keyword AS mk, name AS n,
           person_info AS pi, role_type AS rt, title AS t
      WHERE cct1.kind = 'cast' AND cct2.kind = 'complete+verified'
        AND chn.name = 'Queen'
        AND ci.note IN ('(voice)','(voice) (uncredited)',
                        '(voice: English version)')
        AND cn.country_code = '[us]' AND it1.info = 'release dates'
        AND it3.info = 'trivia' AND k.keyword = 'computer-animation'
        AND mi.info LIKE 'USA:%200%'
        AND n.gender = 'f' AND n.name LIKE '%An%' AND rt.role = 'actress'
        AND t.title = 'Shrek 2' AND t.production_year BETWEEN 2000 AND 2005
        AND kt.id = t.kind_id AND t.id = mi.movie_id
        AND t.id = mc.movie_id AND t.id = ci.movie_id
        AND t.id = mk.movie_id AND t.id = cc.movie_id
        AND mc.movie_id = ci.movie_id AND mc.movie_id = mi.movie_id
        AND mc.movie_id = mk.movie_id AND mc.movie_id = cc.movie_id
        AND mi.movie_id = ci.movie_id AND mi.movie_id = mk.movie_id
        AND mi.movie_id = cc.movie_id AND ci.movie_id = mk.movie_id
        AND ci.movie_id = cc.movie_id AND mk.movie_id = cc.movie_id
        AND cn.id = mc.company_id AND it1.id = mi.info_type_id
        AND n.id = ci.person_id AND rt.id = ci.role_id
        AND n.id = an.person_id AND ci.person_id = an.person_id
        AND chn.id = ci.person_role_id AND n.id = pi.person_id
        AND ci.person_id = pi.person_id AND it3.id = pi.info_type_id
        AND k.id = mk.keyword_id AND cct1.id = cc.subject_id
        AND cct2.id = cc.status_id""",
    "29c" -> """
      SELECT MIN(chn.name) AS voiced_char, MIN(n.name) AS voicing_actress,
             MIN(t.title) AS voiced_animation
      FROM aka_name AS an, complete_cast AS cc, comp_cast_type AS cct1,
           comp_cast_type AS cct2, char_name AS chn, cast_info AS ci,
           company_name AS cn, info_type AS it1, info_type AS it3,
           keyword AS k, kind_type AS kt, movie_companies AS mc,
           movie_info AS mi, movie_keyword AS mk, name AS n,
           person_info AS pi, role_type AS rt, title AS t
      WHERE cct1.kind = 'cast' AND cct2.kind = 'complete+verified'
        AND ci.note IN ('(voice)','(voice: Japanese version)',
                        '(voice) (uncredited)','(voice: English version)')
        AND cn.country_code = '[us]' AND it1.info = 'release dates'
        AND it3.info = 'trivia' AND k.keyword = 'computer-animation'
        AND n.gender = 'f' AND n.name LIKE '%An%' AND rt.role = 'actress'
        AND t.production_year BETWEEN 2000 AND 2010
        AND kt.id = t.kind_id AND t.id = mi.movie_id
        AND t.id = mc.movie_id AND t.id = ci.movie_id
        AND t.id = mk.movie_id AND t.id = cc.movie_id
        AND mc.movie_id = ci.movie_id AND mc.movie_id = mi.movie_id
        AND mc.movie_id = mk.movie_id AND mc.movie_id = cc.movie_id
        AND mi.movie_id = ci.movie_id AND mi.movie_id = mk.movie_id
        AND mi.movie_id = cc.movie_id AND ci.movie_id = mk.movie_id
        AND ci.movie_id = cc.movie_id AND mk.movie_id = cc.movie_id
        AND cn.id = mc.company_id AND it1.id = mi.info_type_id
        AND n.id = ci.person_id AND rt.id = ci.role_id
        AND n.id = an.person_id AND ci.person_id = an.person_id
        AND chn.id = ci.person_role_id AND n.id = pi.person_id
        AND ci.person_id = pi.person_id AND it3.id = pi.info_type_id
        AND k.id = mk.keyword_id AND cct1.id = cc.subject_id
        AND cct2.id = cc.status_id""",

    // ---- family 30: t, cc->{cct1,cct2}, ci->n, mi->it1, mi_idx->it2, mk->k (12) ----
    "30a" -> """
      SELECT MIN(mi.info) AS movie_budget, MIN(mi_idx.info) AS movie_votes,
             MIN(n.name) AS writer, MIN(t.title) AS complete_violent_movie
      FROM complete_cast AS cc, comp_cast_type AS cct1,
           comp_cast_type AS cct2, cast_info AS ci, info_type AS it1,
           info_type AS it2, keyword AS k, movie_info AS mi,
           movie_info_idx AS mi_idx, movie_keyword AS mk, name AS n,
           title AS t
      WHERE cct1.kind IN ('cast','crew') AND cct2.kind = 'complete+verified'
        AND ci.note IN ('(writer)','(head writer)','(written by)','(story)',
                        '(story editor)')
        AND it1.info = 'genres' AND it2.info = 'votes'
        AND k.keyword IN ('murder','violence','blood-splatter','gore',
                          'death','female-nudity','hospital')
        AND mi.info IN ('Horror','Thriller') AND n.gender = 'm'
        AND t.production_year > 2000
        AND t.id = mi.movie_id AND t.id = mi_idx.movie_id
        AND t.id = ci.movie_id AND t.id = mk.movie_id
        AND t.id = cc.movie_id AND ci.movie_id = mi.movie_id
        AND ci.movie_id = mi_idx.movie_id AND ci.movie_id = mk.movie_id
        AND ci.movie_id = cc.movie_id AND mi.movie_id = mi_idx.movie_id
        AND mi.movie_id = mk.movie_id AND mi.movie_id = cc.movie_id
        AND mi_idx.movie_id = mk.movie_id AND mi_idx.movie_id = cc.movie_id
        AND mk.movie_id = cc.movie_id AND n.id = ci.person_id
        AND it1.id = mi.info_type_id AND it2.id = mi_idx.info_type_id
        AND k.id = mk.keyword_id AND cct1.id = cc.subject_id
        AND cct2.id = cc.status_id""",
    "30b" -> """
      SELECT MIN(mi.info) AS movie_budget, MIN(mi_idx.info) AS movie_votes,
             MIN(n.name) AS writer, MIN(t.title) AS complete_gore_movie
      FROM complete_cast AS cc, comp_cast_type AS cct1,
           comp_cast_type AS cct2, cast_info AS ci, info_type AS it1,
           info_type AS it2, keyword AS k, movie_info AS mi,
           movie_info_idx AS mi_idx, movie_keyword AS mk, name AS n,
           title AS t
      WHERE cct1.kind IN ('cast','crew') AND cct2.kind = 'complete+verified'
        AND ci.note IN ('(writer)','(head writer)','(written by)','(story)',
                        '(story editor)')
        AND it1.info = 'genres' AND it2.info = 'votes'
        AND k.keyword IN ('murder','violence','blood-splatter','gore',
                          'death','female-nudity','hospital')
        AND mi.info IN ('Horror','Thriller') AND n.gender = 'm'
        AND t.production_year > 2000
        AND (t.title LIKE '%Freddy%' OR t.title LIKE '%Jason%'
             OR t.title LIKE 'Saw%')
        AND t.id = mi.movie_id AND t.id = mi_idx.movie_id
        AND t.id = ci.movie_id AND t.id = mk.movie_id
        AND t.id = cc.movie_id AND ci.movie_id = mi.movie_id
        AND ci.movie_id = mi_idx.movie_id AND ci.movie_id = mk.movie_id
        AND ci.movie_id = cc.movie_id AND mi.movie_id = mi_idx.movie_id
        AND mi.movie_id = mk.movie_id AND mi.movie_id = cc.movie_id
        AND mi_idx.movie_id = mk.movie_id AND mi_idx.movie_id = cc.movie_id
        AND mk.movie_id = cc.movie_id AND n.id = ci.person_id
        AND it1.id = mi.info_type_id AND it2.id = mi_idx.info_type_id
        AND k.id = mk.keyword_id AND cct1.id = cc.subject_id
        AND cct2.id = cc.status_id""",
    "30c" -> """
      SELECT MIN(mi.info) AS movie_budget, MIN(mi_idx.info) AS movie_votes,
             MIN(n.name) AS writer, MIN(t.title) AS complete_violent_movie
      FROM complete_cast AS cc, comp_cast_type AS cct1,
           comp_cast_type AS cct2, cast_info AS ci, info_type AS it1,
           info_type AS it2, keyword AS k, movie_info AS mi,
           movie_info_idx AS mi_idx, movie_keyword AS mk, name AS n,
           title AS t
      WHERE cct1.kind = 'cast' AND cct2.kind LIKE '%complete%'
        AND ci.note IN ('(writer)','(head writer)','(written by)','(story)',
                        '(story editor)')
        AND it1.info = 'genres' AND it2.info = 'votes'
        AND k.keyword IN ('murder','violence','blood-splatter','gore',
                          'death','female-nudity','hospital')
        AND mi.info IN ('Horror','Action','Sci-Fi','Thriller','Crime','War')
        AND n.gender = 'm' AND t.production_year > 1990
        AND t.id = mi.movie_id AND t.id = mi_idx.movie_id
        AND t.id = ci.movie_id AND t.id = mk.movie_id
        AND t.id = cc.movie_id AND ci.movie_id = mi.movie_id
        AND ci.movie_id = mi_idx.movie_id AND ci.movie_id = mk.movie_id
        AND ci.movie_id = cc.movie_id AND mi.movie_id = mi_idx.movie_id
        AND mi.movie_id = mk.movie_id AND mi.movie_id = cc.movie_id
        AND mi_idx.movie_id = mk.movie_id AND mi_idx.movie_id = cc.movie_id
        AND mk.movie_id = cc.movie_id AND n.id = ci.person_id
        AND it1.id = mi.info_type_id AND it2.id = mi_idx.info_type_id
        AND k.id = mk.keyword_id AND cct1.id = cc.subject_id
        AND cct2.id = cc.status_id""",

    // ---- family 31: t, ci->n, mc->cn, mi->it1, mi_idx->it2, mk->k (11) ----
    "31a" -> """
      SELECT MIN(mi.info) AS movie_budget, MIN(mi_idx.info) AS movie_votes,
             MIN(n.name) AS writer, MIN(t.title) AS violent_liongate_movie
      FROM cast_info AS ci, company_name AS cn, info_type AS it1,
           info_type AS it2, keyword AS k, movie_companies AS mc,
           movie_info AS mi, movie_info_idx AS mi_idx, movie_keyword AS mk,
           name AS n, title AS t
      WHERE ci.note IN ('(writer)','(head writer)','(written by)','(story)',
                        '(story editor)')
        AND cn.name LIKE 'Lionsgate%' AND it1.info = 'genres'
        AND it2.info = 'votes'
        AND k.keyword IN ('murder','violence','blood-splatter','gore',
                          'death','female-nudity','hospital')
        AND mi.info IN ('Horror','Thriller') AND n.gender = 'm'
        AND t.id = mi.movie_id AND t.id = mi_idx.movie_id
        AND t.id = ci.movie_id AND t.id = mk.movie_id
        AND t.id = mc.movie_id AND ci.movie_id = mi.movie_id
        AND ci.movie_id = mi_idx.movie_id AND ci.movie_id = mk.movie_id
        AND ci.movie_id = mc.movie_id AND mi.movie_id = mi_idx.movie_id
        AND mi.movie_id = mk.movie_id AND mi.movie_id = mc.movie_id
        AND mi_idx.movie_id = mk.movie_id AND mi_idx.movie_id = mc.movie_id
        AND mk.movie_id = mc.movie_id AND n.id = ci.person_id
        AND it1.id = mi.info_type_id AND it2.id = mi_idx.info_type_id
        AND k.id = mk.keyword_id AND cn.id = mc.company_id""",
    "31b" -> """
      SELECT MIN(mi.info) AS movie_budget, MIN(mi_idx.info) AS movie_votes,
             MIN(n.name) AS writer, MIN(t.title) AS violent_liongate_movie
      FROM cast_info AS ci, company_name AS cn, info_type AS it1,
           info_type AS it2, keyword AS k, movie_companies AS mc,
           movie_info AS mi, movie_info_idx AS mi_idx, movie_keyword AS mk,
           name AS n, title AS t
      WHERE ci.note IN ('(writer)','(head writer)','(written by)','(story)',
                        '(story editor)')
        AND cn.name LIKE 'Lionsgate%' AND it1.info = 'genres'
        AND it2.info = 'votes'
        AND k.keyword IN ('murder','violence','blood-splatter','gore',
                          'death','female-nudity','hospital')
        AND mc.note LIKE '%(Blu-ray)%'
        AND mi.info IN ('Horror','Thriller') AND n.gender = 'm'
        AND t.production_year > 2000
        AND (t.title LIKE '%Freddy%' OR t.title LIKE '%Jason%'
             OR t.title LIKE 'Saw%')
        AND t.id = mi.movie_id AND t.id = mi_idx.movie_id
        AND t.id = ci.movie_id AND t.id = mk.movie_id
        AND t.id = mc.movie_id AND ci.movie_id = mi.movie_id
        AND ci.movie_id = mi_idx.movie_id AND ci.movie_id = mk.movie_id
        AND ci.movie_id = mc.movie_id AND mi.movie_id = mi_idx.movie_id
        AND mi.movie_id = mk.movie_id AND mi.movie_id = mc.movie_id
        AND mi_idx.movie_id = mk.movie_id AND mi_idx.movie_id = mc.movie_id
        AND mk.movie_id = mc.movie_id AND n.id = ci.person_id
        AND it1.id = mi.info_type_id AND it2.id = mi_idx.info_type_id
        AND k.id = mk.keyword_id AND cn.id = mc.company_id""",
    "31c" -> """
      SELECT MIN(mi.info) AS movie_budget, MIN(mi_idx.info) AS movie_votes,
             MIN(n.name) AS writer, MIN(t.title) AS violent_liongate_movie
      FROM cast_info AS ci, company_name AS cn, info_type AS it1,
           info_type AS it2, keyword AS k, movie_companies AS mc,
           movie_info AS mi, movie_info_idx AS mi_idx, movie_keyword AS mk,
           name AS n, title AS t
      WHERE ci.note IN ('(writer)','(head writer)','(written by)','(story)',
                        '(story editor)')
        AND cn.name LIKE 'Lionsgate%' AND it1.info = 'genres'
        AND it2.info = 'votes'
        AND k.keyword IN ('murder','violence','blood-splatter','gore',
                          'death','female-nudity','hospital')
        AND mi.info IN ('Horror','Action','Sci-Fi','Thriller','Crime','War')
        AND t.id = mi.movie_id AND t.id = mi_idx.movie_id
        AND t.id = ci.movie_id AND t.id = mk.movie_id
        AND t.id = mc.movie_id AND ci.movie_id = mi.movie_id
        AND ci.movie_id = mi_idx.movie_id AND ci.movie_id = mk.movie_id
        AND ci.movie_id = mc.movie_id AND mi.movie_id = mi_idx.movie_id
        AND mi.movie_id = mk.movie_id AND mi.movie_id = mc.movie_id
        AND mi_idx.movie_id = mk.movie_id AND mi_idx.movie_id = mc.movie_id
        AND mk.movie_id = mc.movie_id AND n.id = ci.person_id
        AND it1.id = mi.info_type_id AND it2.id = mi_idx.info_type_id
        AND k.id = mk.keyword_id AND cn.id = mc.company_id""",

    // ---- family 32: t1, mk->k, ml->lt, t2 (6) ----
    "32a" -> """
      SELECT MIN(lt.link) AS link_type, MIN(t1.title) AS first_movie,
             MIN(t2.title) AS second_movie
      FROM keyword AS k, link_type AS lt, movie_keyword AS mk,
           movie_link AS ml, title AS t1, title AS t2
      WHERE k.keyword = '10,000-mile-club'
        AND mk.keyword_id = k.id AND t1.id = mk.movie_id
        AND ml.movie_id = t1.id AND ml.linked_movie_id = t2.id
        AND lt.id = ml.link_type_id AND mk.movie_id = t1.id""",
    "32b" -> """
      SELECT MIN(lt.link) AS link_type, MIN(t1.title) AS first_movie,
             MIN(t2.title) AS second_movie
      FROM keyword AS k, link_type AS lt, movie_keyword AS mk,
           movie_link AS ml, title AS t1, title AS t2
      WHERE k.keyword = 'character-name-in-title'
        AND mk.keyword_id = k.id AND t1.id = mk.movie_id
        AND ml.movie_id = t1.id AND ml.linked_movie_id = t2.id
        AND lt.id = ml.link_type_id AND mk.movie_id = t1.id""",

    // ---- family 33: two hubs via ml, each with mc->cn? no: cn per hub via mc... (14) ----
    "33a" -> """
      SELECT MIN(cn1.name) AS first_company, MIN(cn2.name) AS second_company,
             MIN(mi_idx1.info) AS first_rating, MIN(mi_idx2.info) AS second_rating,
             MIN(t1.title) AS first_movie, MIN(t2.title) AS second_movie
      FROM company_name AS cn1, company_name AS cn2, info_type AS it1,
           info_type AS it2, kind_type AS kt1, kind_type AS kt2,
           link_type AS lt, movie_companies AS mc1, movie_companies AS mc2,
           movie_info_idx AS mi_idx1, movie_info_idx AS mi_idx2,
           movie_link AS ml, title AS t1, title AS t2
      WHERE cn1.country_code = '[us]' AND it1.info = 'rating'
        AND it2.info = 'rating' AND kt1.kind IN ('tv series')
        AND kt2.kind IN ('tv series')
        AND lt.link IN ('sequel','follows','followed by')
        AND mi_idx2.info < '3.0'
        AND t2.production_year BETWEEN 2005 AND 2008
        AND lt.id = ml.link_type_id AND t1.id = ml.movie_id
        AND t2.id = ml.linked_movie_id AND it1.id = mi_idx1.info_type_id
        AND t1.id = mi_idx1.movie_id AND kt1.id = t1.kind_id
        AND cn1.id = mc1.company_id AND t1.id = mc1.movie_id
        AND ml.movie_id = mi_idx1.movie_id AND ml.movie_id = mc1.movie_id
        AND mi_idx1.movie_id = mc1.movie_id AND it2.id = mi_idx2.info_type_id
        AND t2.id = mi_idx2.movie_id AND kt2.id = t2.kind_id
        AND cn2.id = mc2.company_id AND t2.id = mc2.movie_id
        AND ml.linked_movie_id = mi_idx2.movie_id
        AND ml.linked_movie_id = mc2.movie_id
        AND mi_idx2.movie_id = mc2.movie_id""",
    "33b" -> """
      SELECT MIN(cn1.name) AS first_company, MIN(cn2.name) AS second_company,
             MIN(mi_idx1.info) AS first_rating, MIN(mi_idx2.info) AS second_rating,
             MIN(t1.title) AS first_movie, MIN(t2.title) AS second_movie
      FROM company_name AS cn1, company_name AS cn2, info_type AS it1,
           info_type AS it2, kind_type AS kt1, kind_type AS kt2,
           link_type AS lt, movie_companies AS mc1, movie_companies AS mc2,
           movie_info_idx AS mi_idx1, movie_info_idx AS mi_idx2,
           movie_link AS ml, title AS t1, title AS t2
      WHERE cn1.country_code = '[nl]' AND it1.info = 'rating'
        AND it2.info = 'rating' AND kt1.kind IN ('tv series')
        AND kt2.kind IN ('tv series') AND lt.link LIKE '%follow%'
        AND mi_idx2.info < '3.0' AND t2.production_year = 2007
        AND lt.id = ml.link_type_id AND t1.id = ml.movie_id
        AND t2.id = ml.linked_movie_id AND it1.id = mi_idx1.info_type_id
        AND t1.id = mi_idx1.movie_id AND kt1.id = t1.kind_id
        AND cn1.id = mc1.company_id AND t1.id = mc1.movie_id
        AND ml.movie_id = mi_idx1.movie_id AND ml.movie_id = mc1.movie_id
        AND mi_idx1.movie_id = mc1.movie_id AND it2.id = mi_idx2.info_type_id
        AND t2.id = mi_idx2.movie_id AND kt2.id = t2.kind_id
        AND cn2.id = mc2.company_id AND t2.id = mc2.movie_id
        AND ml.linked_movie_id = mi_idx2.movie_id
        AND ml.linked_movie_id = mc2.movie_id
        AND mi_idx2.movie_id = mc2.movie_id""",
    "33c" -> """
      SELECT MIN(cn1.name) AS first_company, MIN(cn2.name) AS second_company,
             MIN(mi_idx1.info) AS first_rating, MIN(mi_idx2.info) AS second_rating,
             MIN(t1.title) AS first_movie, MIN(t2.title) AS second_movie
      FROM company_name AS cn1, company_name AS cn2, info_type AS it1,
           info_type AS it2, kind_type AS kt1, kind_type AS kt2,
           link_type AS lt, movie_companies AS mc1, movie_companies AS mc2,
           movie_info_idx AS mi_idx1, movie_info_idx AS mi_idx2,
           movie_link AS ml, title AS t1, title AS t2
      WHERE cn1.country_code != '[us]' AND it1.info = 'rating'
        AND it2.info = 'rating' AND kt1.kind IN ('tv series','episode')
        AND kt2.kind IN ('tv series','episode')
        AND lt.link IN ('sequel','follows','followed by')
        AND mi_idx2.info < '3.5'
        AND t2.production_year BETWEEN 2000 AND 2010
        AND lt.id = ml.link_type_id AND t1.id = ml.movie_id
        AND t2.id = ml.linked_movie_id AND it1.id = mi_idx1.info_type_id
        AND t1.id = mi_idx1.movie_id AND kt1.id = t1.kind_id
        AND cn1.id = mc1.company_id AND t1.id = mc1.movie_id
        AND ml.movie_id = mi_idx1.movie_id AND ml.movie_id = mc1.movie_id
        AND mi_idx1.movie_id = mc1.movie_id AND it2.id = mi_idx2.info_type_id
        AND t2.id = mi_idx2.movie_id AND kt2.id = t2.kind_id
        AND cn2.id = mc2.company_id AND t2.id = mc2.movie_id
        AND ml.linked_movie_id = mi_idx2.movie_id
        AND ml.linked_movie_id = mc2.movie_id
        AND mi_idx2.movie_id = mc2.movie_id""")
}
